package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the sf10 spot-gate's key list (tools/spotverify_sf10.sh)
  * against silent drift: `graft.Verify` FILTERS to the requested
  * subset, so a typo'd or stale key would simply not run — the gate
  * would shrink without failing. This spec makes that loud, and pins
  * the documented exclusion set so adding a query key forces an
  * explicit decision (gate it, or justify the exclusion in the
  * script header).
  */
class GateSubsetSpec extends AnyFunSuite {

  // resolve against the build root, not the fork CWD: sbt may run
  // tests forked from a different working directory (advisor r14)
  private val script: java.io.File = {
    val candidates = Seq(
      new java.io.File(sys.props("user.dir"), "tools/spotverify_sf10.sh"),
      new java.io.File("tools/spotverify_sf10.sh"))
    candidates.find(_.isFile).getOrElse(
      fail(s"tools/spotverify_sf10.sh not found from " +
        s"user.dir=${sys.props("user.dir")} or CWD"))
  }

  private def subset: Set[String] = {
    val src = scala.io.Source.fromFile(script)(scala.io.Codec.UTF8)
    val text = try src.mkString finally src.close()
    // anchored to line start, and exactly ONE assignment allowed — a
    // quoted SUBSET="..." example in a comment must not shadow it
    val ms = """(?m)^SUBSET="([^"]+)"""".r.findAllMatchIn(text).toList
    assert(ms.size == 1,
      s"expected exactly one line-start SUBSET= assignment in $script, " +
        s"found ${ms.size}")
    ms.head.group(1).split(",").map(_.trim).toSet
  }

  /** The keys the gate deliberately leaves out, each justified by a
    * measured comment in the script header. A key appearing in
    * NEITHER the subset NOR this list fails the spec.
    */
  private val justifiedExclusions = Set(
    // EXACT pair jaccard over source blocks that GROW with the corpus
    // (6.25e9 pairwise list-intersections at sf10 — the one
    // structural exclusion left after the r15 staged-oracle widening)
    "dedup_ngram",
    // output IS the 100M-row log; its four consumers gate it, and
    // since r18 evt_produce_stats hash-gates the offset assignment
    // itself at sf10 (P-row modular key↔offset checksum)
    "evt_produce",
    // declared approximations with measured dispositions
    "txt_approx_topk", "q_approx_distinct")

  test("every gate subset key exists in SparkEntry.queries") {
    val unknown = subset -- SparkEntry.queries.keySet
    assert(unknown.isEmpty,
      s"subset keys not in queries map (typo/stale): $unknown")
  }

  test("every query key is either gated or a justified exclusion") {
    val missing = SparkEntry.queries.keySet -- subset -- justifiedExclusions
    assert(missing.isEmpty,
      s"keys neither sf10-gated nor justified-excluded: $missing")
    val overlap = subset.intersect(justifiedExclusions)
    assert(overlap.isEmpty,
      s"keys both gated and listed as excluded: $overlap")
  }

  test("gated keys have oracle SQL (the gate compares against DuckDB)") {
    val noOracle = subset -- SparkEntry.oracleSql.keySet
    assert(noOracle.isEmpty,
      s"gated keys with no oracleSql entry: $noOracle")
  }
}
