package graft.tools

import org.apache.spark.sql.functions._

/** Scratch micro-bench for expression-cost bisection (not part of the
  * library surface; driven by SPARK_GRAFT_PROBE_* env vars).
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    import spark.implicits._
    val docs = graft.core.Tables.documents(spark, sfDir)
    println(s"scan partitions: ${docs.rdd.getNumPartitions}")
    def time(name: String)(dfe: => org.apache.spark.sql.DataFrame): Unit = {
      val df = dfe
      val t0 = System.nanoTime()
      df.queryExecution.toRdd.count()
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    val base = docs.withColumn("words", expr("split(trim(text), ' +')"))
    time("scan_only")(docs.select($"doc_id"))
    time("split")(base.select($"doc_id", expr("size(words)").as("n")))
    time("split_stop_filter")(base.select($"doc_id",
      expr("size(filter(words, w -> w IN ('the','a','of','and','to','in','is')))").as("n")))
    time("split_distinct")(base.select($"doc_id",
      expr("size(array_distinct(words))").as("n")))
    time("regexp_punct")(docs.select($"doc_id",
      expr("cast(regexp_count(text, '[^a-z0-9 ]') as double)").as("n")))
    time("full_quality")(graft.text.TextAnalysis.txtQuality(spark, sfDir))
    time("full_repetition")(graft.text.TextAnalysis.txtRepetition(spark, sfDir))
    if (sys.env.contains("SPARK_GRAFT_PROBE_INCR")) {
      val bands = graft.dedup.Dedup.contentBands(docs)
      time("content_bands")(bands)
      val cached = bands.persist()
      time("bands_cache_fill")(cached)
      time("bands_cache_read")(cached)
      time("full_incremental")(
        graft.dedup.Dedup.dedupIncremental(spark, sfDir))
    }
  }
}
