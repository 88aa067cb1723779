package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.text.TextAnalysis

/** Incremental DSIR model maintenance — the streaming twin of
  * [[graft.text.TextAnalysis.txtDsirWeights]], and the fifth
  * stored-artifact ingest (DedupIngest grows the band index,
  * AnnIngest the PQ codes, MvIngest an aggregate view, CdcIngest the
  * keyed table state, DsirIngest the importance-weight BUCKET MODEL).
  * Each micro-batch reduces its document slice to the 8192-bucket
  * (c_src, c_tgt) count partial — counting is ASSOCIATIVE (counts
  * over a union of slices are the sums of per-slice counts), which
  * is what makes the model streamable — written under the
  * micro-batch id with dynamic partition overwrite, so a
  * crash-replayed batch rewrites its own partition instead of
  * double-counting (the [[DedupIngest]] idempotence contract).
  *
  * The add-one-smoothed coefficient is derived at READ time, after
  * the partial merge, never stored: smoothing is NOT associative
  * (`(c+1)` partials would add one per batch), the raw counts are.
  *
  * Scale story (100 TB): each increment scans only its own slice;
  * every stored partial is ≤ 8192 rows REGARDLESS of slice size
  * (metadata-sized by construction), so the model merge costs
  * 8192 × batches rows whether the corpus is 1 GB or 100 TB, and
  * scoring any document set against the maintained model is the
  * same broadcast join the batch operator uses.
  */
object DsirIngest {

  /** The 8192-bucket count partial of one document slice. */
  def partials(docs: DataFrame): DataFrame =
    TextAnalysis.dsirBucketCounts(TextAnalysis.dsirHashedBigrams(docs))

  /** Build the model's history partition from an existing corpus,
    * under batch id -1 (streamed batches are ≥ 0, so they can never
    * dynamic-overwrite the seed). Static overwrite = rebuild.
    */
  def seed(docs: DataFrame, modelPath: String): Unit =
    partials(docs).withColumn("ingest_batch", lit(-1L))
      .write.partitionBy("ingest_batch")
      .mode("overwrite").parquet(modelPath)

  /** Maintain the model from a document stream: one bucket-count
    * partition per micro-batch, idempotent under replay.
    */
  def start(docs: DataFrame, modelPath: String,
            checkpointPath: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        partials(batch).withColumn("ingest_batch", lit(batchId))
          .write.partitionBy("ingest_batch")
          .option("partitionOverwriteMode", "dynamic")
          .mode("overwrite").parquet(modelPath)
        ()
      }
      .start()

  /** The merged raw model: bucket-wise sums over every stored
    * partial — 8192 × batches input rows, 8192 output rows.
    */
  def readModel(spark: SparkSession, modelPath: String): DataFrame =
    spark.read.parquet(modelPath)
      .groupBy(col("bucket"))
      .agg(sum(col("c_src")).as("c_src"), sum(col("c_tgt")).as("c_tgt"))

  /** Score any document set under the maintained model. Over the
    * union of the ingested slices this matches
    * [[graft.text.TextAnalysis.txtDsirWeights]] bit-for-bit
    * (asserted per prefix in IngestSpec).
    */
  def score(spark: SparkSession, modelPath: String,
            docs: DataFrame): DataFrame =
    TextAnalysis.dsirScoreWith(
      TextAnalysis.dsirHashedBigrams(docs),
      readModel(spark, modelPath))
}
