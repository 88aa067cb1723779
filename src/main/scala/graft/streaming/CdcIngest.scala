package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Incremental CDC materialization — the streaming twin of
  * [[graft.operators.Events.evtCdcApply]], and the fourth stored-
  * artifact ingest (DedupIngest grows the band index, AnnIngest the
  * PQ codes, MvIngest an aggregate view, CdcIngest a KEYED TABLE
  * STATE with delete tombstones). Each micro-batch reduces its slice
  * to per-key LAST IMAGES plus an op count — the last-image-wins
  * algebra is associative (last-of-lasts == the global last image,
  * op counts sum), which is what makes per-batch reduction durable —
  * written under the micro-batch id with dynamic partition overwrite,
  * so a crash-replayed batch rewrites its own partition instead of
  * double-applying (the [[DedupIngest]] idempotence contract; the
  * reference's compacted-topic semantics, cleanup.policy=compact +
  * tombstones, jc/DemoApplication.java:95-160).
  *
  * [[read]] merges the stored per-batch images by EVENT TIME
  * (ts, event_id) — never by batch id, so a late-arriving batch
  * carrying old images cannot win by arrival order — and drops keys
  * whose winning image is a tombstone. Tombstone rows are RETAINED in
  * the store (not dropped at partial time): a delete must keep
  * masking older images from earlier batches, exactly the LSM
  * semantics of the AnnIndex tombstones.
  *
  * Scale story (100 TB): each increment scans only its own events;
  * the merge input is key-sized × batches (images, not events), so
  * serving the table costs the same whether the log is 1 GB or
  * 100 TB — compaction, when wanted, is just seed(read-result-shaped
  * replay) under a fresh root. Like MvIngest, the exactly-once
  * contract is per BATCH (partition overwrite); the source is
  * responsible for not delivering the same event in two DIFFERENT
  * batches (Structured Streaming's file/Kafka sources do exactly
  * that via checkpointed offsets).
  */
object CdcIngest {

  /** Per-key last image + op count of one event slice (tombstones
    * retained — they must mask earlier batches at read time). The
    * reduction — including the (ts, event_id) ordering contract — is
    * [[graft.operators.Events.cdcLastImages]], shared with the batch
    * apply so the streamed and batch paths cannot diverge.
    */
  def partials(events: DataFrame): DataFrame =
    graft.operators.Events.cdcLastImages(events)

  /** Build the table's history partition from an existing corpus,
    * under batch id -1 (streamed batches are ≥ 0, so they can never
    * dynamic-overwrite the seed). Static overwrite = rebuild.
    */
  def seed(events: DataFrame, tablePath: String): Unit =
    partials(events).withColumn("ingest_batch", lit(-1L))
      .write.partitionBy("ingest_batch")
      .mode("overwrite").parquet(tablePath)

  /** Maintain the table from an event stream: one last-image
    * partition per micro-batch, idempotent under replay.
    */
  def start(events: DataFrame, tablePath: String,
            checkpointPath: String): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        partials(batch).withColumn("ingest_batch", lit(batchId))
          .write.partitionBy("ingest_batch")
          .option("partitionOverwriteMode", "dynamic")
          .mode("overwrite").parquet(tablePath)
        ()
      }
      .start()

  /** The current table: key-sized re-merge of every stored image by
    * event time, tombstone winners dropped. Matches
    * [[graft.operators.Events.cdcApply]] over the same events
    * bit-for-bit (asserted per prefix in IngestSpec).
    */
  def read(spark: SparkSession, tablePath: String): DataFrame =
    spark.read.parquet(tablePath)
      .withColumn("rn",
        row_number().over(graft.operators.Events.cdcLatest))
      .withColumn("total_ops",
        sum(col("n_ops")).over(graft.operators.Events.cdcByKey))
      .filter(col("rn") === 1 && col("op") =!= "D")
      .select(col("user_id"), col("event_type").as("final_type"),
              col("value").as("final_value"),
              col("total_ops").cast("long").as("n_ops"))
}
