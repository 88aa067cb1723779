package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Events, Relational}

/** Plan-shape audits: the properties that matter at 100 TB — filter
  * pushdown into the parquet scan, column pruning, broadcast of
  * dimension sides, whole-stage codegen, and shuffle counts — locked
  * in as assertions so a regression in plan quality fails CI, not a
  * cluster bill.
  */
class PlanAuditSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.Sf

  private def capture(df: org.apache.spark.sql.DataFrame, mode: String): String = {
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) { df.explain(mode) }
    out.toString
  }

  test("q1: filter pushed to parquet scan, columns pruned, codegen on") {
    val df = Relational.q1PricingSummary(spark, sf)
    val fmt = capture(df, "formatted")
    assert(fmt.contains("PushedFilters"), fmt)
    assert(fmt.contains("LessThanOrEqual(l_shipdate"), "shipdate filter not pushed")
    // pruned scan: none of the untouched columns appear anywhere
    assert(!fmt.contains("l_orderkey"), "scan reads columns q1 never uses")
    // AQE's pre-execution simple plan hides *(n) markers; codegen
    // mode prints the generated subtrees directly
    assert(capture(df, "codegen").contains("WholeStageCodegen subtree"),
      "no whole-stage codegen spans")
  }

  test("q5: all five dimension joins broadcast") {
    val p = capture(Relational.q5LocalSupplier(spark, sf), "simple")
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).size
    assert(broadcasts >= 4, s"expected >=4 broadcast joins, got $broadcasts\n$p")
  }

  test("evt_enrich: dims broadcast, no sort-merge join") {
    val p = capture(Events.evtEnrich(spark, sf), "simple")
    assert("BroadcastHashJoin".r.findAllIn(p).size == 2, p)
    assert(!p.contains("SortMergeJoin"), "dim join fell back to sort-merge")
  }

  test("asof join: at most one hash shuffle (union-sort, no per-key blowup)") {
    val p = capture(Relational.qAsofJoin(spark, sf), "simple")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges <= 2, s"asof join shuffles too much ($exchanges)\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("dedup_ngram self-join at scale: one shuffle, ReusedExchange on the other side") {
    // at 100 TB documents won't broadcast; the self-join must then
    // canonicalize both sides to a single exchange (word sets are
    // computed and shuffled once, not per side)
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = graft.dedup.Dedup.dedupNgram(spark, sf)
      df.collect() // AQE finalizes the plan on execution
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("ReusedExchange"),
        s"self-join sides did not share the exchange\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("JaccardLengthPruning injects the size prefilter ahead of the merge scan") {
    val df = graft.dedup.Dedup.dedupNgram(spark, sf)
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("least(") && opt.contains("greatest(") && opt.contains("size("),
      s"length prefilter not injected\n$opt")
    // the original jaccard bound is still there (rule only adds an
    // implied conjunct, never replaces the exact predicate)
    assert(opt.toLowerCase.contains("sortedjaccard"), opt)
  }

  test("JaccardLengthPruning is semantics-preserving (same rows with rule excluded)") {
    val withRule = graft.dedup.Dedup.dedupNgram(spark, sf).collect().toSet
    spark.conf.set("spark.sql.optimizer.excludedRules",
      "graft.plans.JaccardLengthPruning")
    try {
      val withoutRule = graft.dedup.Dedup.dedupNgram(spark, sf).collect().toSet
      assert(withRule == withoutRule)
    } finally spark.conf.unset("spark.sql.optimizer.excludedRules")
  }

  test("q_promo_effect: part dim broadcast, date filter pushed to fact scan") {
    val df = graft.operators.Relational.qPromoEffect(spark, sf)
    val fmt = capture(df, "formatted")
    assert(fmt.contains("BroadcastHashJoin"), fmt)
    assert(fmt.contains("GreaterThanOrEqual(l_shipdate"), "shipdate filter not pushed")
  }

  test("pipeline_prep: whole pipeline in two shuffles") {
    // lang/quality filters sit ABOVE the dedup window by design
    // (filtering first would change which duplicate survives), so the
    // plan-shape guarantee is the shuffle bound: dedup hash partition
    // + final aggregate, nothing else
    val p = capture(graft.operators.Analytics.pipelinePrep(spark, sf), "formatted")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges <= 2, s"pipeline shuffles too much ($exchanges)\n$p")
  }

  test("dedup_exact: partial aggregation before the shuffle") {
    val p = capture(graft.dedup.Dedup.dedupExact(spark, sf), "simple")
    // partial + final pair means map-side combine happens pre-shuffle
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }
}
