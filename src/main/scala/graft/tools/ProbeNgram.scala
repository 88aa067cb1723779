package graft.tools

import org.apache.spark.sql.SparkSession

import graft.core.GraftSession

/** Stage-split probe for the dedup_ngram scaling disposition
  * (SCALING_NOTES_r09.md): times the candidate stage (prefix join +
  * ids-only distinct) separately from the full operator (candidates
  * + merge-scan verify) on `args(0)`'s tables, so the decade ratio
  * can be attributed to the right stage instead of guessed.
  *
  * Run: SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.ProbeNgram <sfDir>"
  * Protocol: full op FIRST (cold, matches the bench number), then
  * candidates-only — both from fresh plans; the pinned doc+prefix
  * relation is unpersisted between the two so neither leg reuses the
  * other's work.
  */
object ProbeNgram {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(sys.env("SPARK_GRAFT_SF_DIR"))
    val spark: SparkSession =
      GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    def timed(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe-ngram] $label%-12s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
      spark.catalog.clearCache()
      spark.sharedState.cacheManager.clearCache()
    }
    timed("full")(graft.dedup.Dedup.dedupNgram(spark, sfDir).count())
    // merge-scan path forced (the default dispatch takes the bitmask
    // path on the small-vocab test corpus) — the A/B for the guardrail
    spark.conf.set("spark.graft.ngram.maskVocabMax", "0")
    timed("full-array")(graft.dedup.Dedup.dedupNgram(spark, sfDir).count())
    timed("candidates") {
      val (_, cands) = graft.dedup.Dedup.ngramCandidates(spark, sfDir)
      cands.count()
    }
    spark.conf.unset("spark.graft.ngram.maskVocabMax")
    spark.stop()
  }
}
