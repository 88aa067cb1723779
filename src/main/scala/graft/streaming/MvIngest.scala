package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Incremental materialized-view maintenance — the third stored-
  * artifact ingest (DedupIngest grows the band index, AnnIngest the
  * PQ codes, MvIngest a queryable AGGREGATE), and the exact-count
  * twin of ScaleSpec's approximate HLL re-merge: each event
  * micro-batch folds to per-(day, event_type) PARTIALS — a row count
  * and an exact integer-cents value sum, the algebra that makes
  * map-side combine durable — written under the micro-batch id with
  * dynamic partition overwrite, so a crash-replayed batch rewrites
  * its own partition instead of double-counting (the
  * [[DedupIngest]] idempotence contract; the reference consumer's
  * at-least-once poll loop, jc/DemoApplication.java:130-160, made
  * effectively exactly-once). [[read]] re-merges all partials into
  * the current view: sums of counts and sums, with the average
  * DERIVED at read time — never stored, because averages don't merge.
  *
  * Scale story (100 TB): the nightly increment scans ONLY its own
  * events; history is never re-read. The merge input is partial-sized
  * (batches × days × types rows — metadata, not data), so serving the
  * view costs the same whether the fact table is 1 GB or 100 TB. The
  * batch twin checked against the DuckDB oracle is
  * [[graft.operators.Events.evtMvMerge]]; streamed == recomputed is
  * asserted per prefix in IngestSpec.
  *
  * Value sums are exact integer cents (`round(value·100)` per event —
  * the q7 money recipe): partial sums re-aggregate to the single-pass
  * sum bit-for-bit regardless of batch boundaries or shuffle order,
  * which double accumulation would not.
  */
object MvIngest {

  /** Per-(day, type) partial aggregate of one event slice. */
  def partials(events: DataFrame): DataFrame =
    events
      .withColumn("day", to_date(col("ts")))
      .withColumn("cents", expr("cast(round(value * 100, 0) as bigint)"))
      .groupBy(col("day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           sum(col("cents")).as("total_cents"))

  /** Build the view's history partition from an existing corpus of
    * events, under batch id -1 (streamed batches are ≥ 0, so they can
    * never dynamic-overwrite the seed). STATIC overwrite: re-seeding
    * means "rebuild the view", discarding prior streamed partials.
    */
  def seed(events: DataFrame, mvPath: String): Unit =
    partials(events).withColumn("ingest_batch", lit(-1L))
      .write.partitionBy("ingest_batch")
      .mode("overwrite").parquet(mvPath)

  /** Maintain the view from an event stream: one partial-aggregate
    * partition per micro-batch, idempotent under replay.
    */
  def start(events: DataFrame, mvPath: String,
            checkpointPath: String): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        partials(batch).withColumn("ingest_batch", lit(batchId))
          .write.partitionBy("ingest_batch")
          .option("partitionOverwriteMode", "dynamic")
          .mode("overwrite").parquet(mvPath)
        ()
      }
      .start()

  /** The current view: MV-sized re-merge of every stored partial.
    * Duplicate-partition-proof by construction (each batch owns its
    * partition); the average derives from the merged sums.
    */
  def read(spark: SparkSession, mvPath: String): DataFrame =
    spark.read.parquet(mvPath)
      .groupBy(col("day"), col("event_type"))
      .agg(sum(col("n_events")).cast("long").as("n_events"),
           sum(col("total_cents")).cast("long").as("total_cents"))
      .withColumn("avg_cents", expr("total_cents div n_events"))
}
