package graft.tools

import org.apache.spark.sql.functions._

/** A/B probe for the r13 pre-collapsed incremental-dedup path:
  * derive-on-the-fly class relations vs reading them from the stored
  * index. Usage: runMain graft.tools.ProbeIncr <sfDir> [cpus]
  */
object ProbeIncr {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = graft.core.GraftSession.local(
      if (args.length > 1) args(1).toInt else 16)
    import spark.implicits._
    val docs = graft.core.Tables.documents(spark, sfDir)
      .select($"doc_id", $"text")
    val idx = java.nio.file.Files
      .createTempDirectory("graft-probe-incr").toString + "/index"
    graft.streaming.DedupIngest.seedIndex(
      docs.filter($"doc_id" % 4 =!= 0), idx)
    val bands = graft.dedup.Dedup
      .contentBands(docs.filter($"doc_id" % 4 === 0)).persist()
    bands.count()
    def time(tag: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      // min of two passes, the bench protocol
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val n = df.queryExecution.toRdd.count()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[probe-incr] $tag%-14s ${ts.map(_._1).min}%8.2f s  " +
        s"rows=${ts.head._2}")
    }
    time("derived") {
      graft.dedup.Dedup.incrementalDecisions(bands,
        spark.read.parquet(s"$idx/bands")
          .select("doc_id", "content_hash", "sig_class", "band_idx",
                  "band_hash"))
    }
    time("precollapsed") {
      graft.dedup.Dedup.incrementalDecisionsPreCollapsed(bands,
        spark.read.parquet(s"$idx/classbands"),
        spark.read.parquet(s"$idx/classsizes"),
        spark.read.parquet(s"$idx/hashes"))
    }
    spark.stop()
  }
}
