package graft.tools

import org.apache.spark.sql.functions._

/** Throwaway stage-by-stage profiler for the minhash band pipeline
  * (scaling-bench diagnosis; not part of the library surface).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/bench-data/sf1")
    val spark = graft.core.GraftSession.local(32)
    import spark.implicits._
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] ${(System.nanoTime() - t0) / 1e9}%7.2f s  n=$n%-9d $tag")
    }
    val docs = graft.core.Tables.documents(spark, sfDir)
    time("scan text")(docs.select($"doc_id", $"text").count())
    val wset = docs.withColumn("wset", expr("array_distinct(split(trim(text), ' +'))"))
    time("wset")(wset.select($"doc_id", $"wset").filter(size($"wset") >= 0).count())
    val sig = wset.withColumn("sig", graft.functions.minhashSigMd5($"wset", 64))
    time("sig")(sig.select($"doc_id", $"sig").filter(size($"sig") >= 0).count())
    val bands = graft.dedup.Dedup.minhashBands(docs)
    time("bands")(bands.count())
    time("bands again")(bands.count())
    time("full dedupMinhash")(graft.dedup.Dedup.dedupMinhash(spark, sfDir).count())
    spark.catalog.clearCache()
    val sh = wset.withColumn("simhash", graft.functions.simhash64Md5($"wset"))
    time("simhash sig")(sh.select($"doc_id", $"simhash")
      .filter($"simhash" =!= 0).count())
    time("full dedupSimhash")(graft.dedup.Dedup.dedupSimhash(spark, sfDir).count())
    spark.stop()
  }
}
