package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Multimodal-column plumbing: image/audio/video payloads are opaque
  * `binary` columns with typed metadata alongside. The codec libraries
  * are not present in this container, so the *decode* step is a
  * clearly-marked deterministic stub — the Spark-side plumbing
  * (schema, batching, partition-local processing, frame fan-out) is
  * real and is what matters at 100 TB.
  */
object Multimodal {

  /** Documents' text re-encoded as an opaque binary payload — the
    * stand-in for a real media blob column.
    */
  private def withBlob(df: DataFrame): DataFrame =
    df.withColumn("blob", col("text").cast("binary"))

  /** Typed metadata over a binary column, aggregated per source:
    * payload count, total bytes, distinct content checksums.
    */
  def mmBinaryMeta(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    withBlob(Tables.documents(spark, sfDir))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_blobs"),
           sum(length($"blob")).cast("long").as("total_bytes"),
           countDistinct(md5($"blob")).as("n_checksums"))
  }

  /** Frame sampling: each blob splits into fixed 64-byte "frames"
    * (the batch shape a video decoder would emit), fanned out with
    * posexplode and fingerprinted. `frame_feature` is the STUBBED
    * decode — a deterministic hash-derived fake standing in for real
    * pixel/audio features; swap `xxhash64`-based features for a codec
    * call when the libraries exist. Partition-local end to end.
    */
  def mmFrameSample(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    withBlob(Tables.documents(spark, sfDir))
      .withColumn("frames",
        expr("transform(sequence(0, cast(floor((length(blob)-1)/64) as int)), " +
             "f -> substring(blob, f*64+1, 64))"))
      .select($"doc_id", posexplode($"frames").as(Seq("frame_idx", "frame")))
      .select(
        $"doc_id", $"frame_idx",
        length($"frame").as("frame_bytes"),
        xxhash64($"frame").as("frame_hash"),
        // STUB decoder: deterministic fake features, not real media
        expr("transform(sequence(0, 3), k -> pmod(xxhash64(frame, k), 256) / 255.0)")
          .as("frame_feature"))
  }
}
