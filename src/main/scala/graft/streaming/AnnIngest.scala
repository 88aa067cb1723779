package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.similarity.AnnIndex

/** Streaming ANN-index ingest — the production recipe for a vector
  * store that grows continuously (the streaming twin of
  * [[AnnIndex.append]], mirroring [[DedupIngest]] for the band
  * index): each micro-batch of new vectors is PQ-encoded against the
  * FROZEN codebook and appended as its own code partition.
  * Re-training the quantizers is the scheduled batch job
  * ([[AnnIndex.seed]]), never the ingest path — the Spark-native
  * shape of the reference's continuous producer feeding a durable
  * log (joshlong-attic/spring-and-kafka, jc/DemoApplication.java:
  * 100-125).
  *
  * Recovery: the sink partitions by `ingest_batch` with dynamic
  * overwrite, so an at-least-once replay of a micro-batch rewrites
  * exactly its own partition with identical rows (sign codes are
  * deterministic) — the streamed index state equals the batch-built
  * one at every corpus prefix (spec-asserted in AnnIndexSpec).
  */
object AnnIngest {

  /** Start the ingest over a STREAMING frame of
    * (vec_id: long, label: long, v: array&lt;double&gt;). The index at
    * `indexPath` must already be seeded ([[AnnIndex.seed]]) — the
    * frozen quantizer artifacts are the query-side contract.
    */
  def start(vecs: DataFrame, indexPath: String,
            checkpointPath: String): StreamingQuery =
    vecs.writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        AnnIndex.append(batch.toDF(), indexPath, batchId)
        ()
      }
      .start()
}
