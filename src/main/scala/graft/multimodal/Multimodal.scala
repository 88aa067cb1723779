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

  /** Chunk-level dedup over binary payloads (content-addressable
    * storage shape, fixed 64-byte chunking): each blob splits into
    * chunks, chunks hash, and the per-source distinct/total chunk
    * ratio measures cross-blob redundancy. At 100 TB this is the
    * dedup that runs BELOW document granularity — the chunk explode
    * is per-row (no shuffle) and the aggregate is one partial-final
    * pass on source.
    */
  def mmChunkDedup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // chunk count and chunk content both in the CHAR domain
    // (length(text) + substring(text, ...)): on multibyte text a
    // byte-derived count would overshoot the char-addressed substring
    // and emit phantom empty chunks
    withBlob(Tables.documents(spark, sfDir))
      .withColumn("n_chunks_doc",
        greatest(lit(1L), ceil(length($"text") / lit(64.0))))
      .withColumn("chunk", explode(expr(
        "transform(sequence(0, cast(n_chunks_doc as int) - 1)," +
          " i -> substring(text, i*64 + 1, 64))")))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_chunks"),
           countDistinct(md5($"chunk")).as("n_distinct_chunks"),
           round(countDistinct(md5($"chunk")) / count(lit(1)).cast("double"), 4)
             .as("uniq_ratio"))
  }

  /** Batch decode via `mapPartitions` — the Scala analog of a Pandas
    * UDF over `mapInPandas`: the decoder sees an iterator of blobs
    * per partition (so a real codec could amortize init/model load
    * across the batch) and emits fixed-width feature vectors. The
    * decode itself is a STUB — deterministic byte statistics per
    * 64-byte frame standing in for pixel/audio features; the
    * partition-local batching, schema, and typed-Dataset plumbing are
    * the real contract.
    */
  def mmDecodeBatch(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select($"doc_id", $"text")
      .as[(Long, String)]
      .mapPartitions { docs =>
        // a real decoder would initialize its codec once, here
        docs.map { case (docId, text) =>
          val bytes = text.getBytes("UTF-8")
          val frames = bytes.grouped(64).toArray
          val means = frames.map(f => f.map(_.toInt & 0xff).sum.toDouble / f.length)
          (docId, frames.length,
            math.round(means.sum / means.length * 10000.0) / 10000.0,
            means.map(m => math.round(m * 100.0) / 100.0))
        }
      }
      .toDF("doc_id", "n_frames", "mean_byte", "frame_means")
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
