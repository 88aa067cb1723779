package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Relational

class RelationalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.Sf

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query runs and oracle keys are a subset") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      withClue(name)(assert(n >= 0))
    }
  }

  test("curriculum: phases tile the corpus on the fixed thresholds") {
    import spark.implicits._
    val c = graft.operators.Analytics.pipelineCurriculum(spark, sf)
    assert(c.count() == graft.core.Tables.documents(spark, sf).count())
    val bad = c.filter(
      ($"phase" === 0 && $"n_tokens" >= 64) ||
      ($"phase" === 1 && ($"n_tokens" < 64 || $"n_tokens" >= 192)) ||
      ($"phase" === 2 && $"n_tokens" < 192) ||
      $"phase" < 0 || $"phase" > 2 || $"order_key" < 0).count()
    assert(bad == 0, s"$bad docs violate the phase thresholds")
    // the order key decorrelates from doc_id: consecutive ids land in
    // different halves of the key space somewhere
    assert(c.select($"order_key").distinct().count() == c.count())
  }

  test("q1 aggregates are internally consistent") {
    import spark.implicits._
    val r = Relational.q1PricingSummary(spark, sf)
    val total = r.agg(sum($"count_order")).as[Long].head()
    val rows = graft.core.Tables.lineitem(spark, sf)
      .filter($"l_shipdate" <= lit("1998-09-02")).count()
    assert(total == rows)
  }

  test("approx distinct within 5% of exact") {
    import spark.implicits._
    val exact = Relational.qDistinct(spark, sf)
      .select($"o_orderpriority", $"n_customers").as[(String, Long)].collect().toMap
    val approx = Relational.qApproxDistinct(spark, sf)
      .select($"o_orderpriority", $"approx_customers").as[(String, Long)].collect().toMap
    exact.foreach { case (k, v) =>
      assert(math.abs(approx(k) - v).toDouble / v < 0.05, s"$k: $v vs ${approx(k)}")
    }
  }

  test("asof join matches only orders at or before the event") {
    import spark.implicits._
    val bad = Relational.qAsofJoin(spark, sf)
      .join(graft.core.Tables.orders(spark, sf), Seq("o_orderkey"))
      .join(graft.core.Tables.events(spark, sf), Seq("event_id"))
      .filter($"o_orderdate" > $"ts")
      .count()
    assert(bad == 0)
  }

  test("approx percentiles within 5% of exact") {
    import spark.implicits._
    val exact = Relational.qPercentiles(spark, sf)
      .select($"o_orderstatus", $"p50", $"p90")
      .as[(String, Double, Double)].collect()
      .map { case (k, a, b) => k -> (a, b) }.toMap
    Relational.qApproxPercentile(spark, sf)
      .select($"o_orderstatus", $"ap50", $"ap90")
      .as[(String, Double, Double)].collect().foreach { case (k, a50, a90) =>
        val (e50, e90) = exact(k)
        assert(math.abs(a50 - e50) / e50 < 0.05, s"$k p50: $a50 vs $e50")
        assert(math.abs(a90 - e90) / e90 < 0.05, s"$k p90: $a90 vs $e90")
      }
  }

  test("sketch fallback (quantileAccuracy knob) agrees with the exact histogram path") {
    // the default path is the exact distinct-value histogram (valid
    // at any group size); the knob re-selects the mergeable GK
    // sketch for continuous domains. While 2n/accuracy < 1 the
    // sketch answers the identical ⌈q·n⌉-rank element — pin the two
    // paths against each other at the test SF so neither can drift.
    import spark.implicits._
    val exact = Relational.qApproxPercentile(spark, sf)
      .orderBy($"o_orderstatus").collect().toSeq
    spark.conf.set("spark.graft.quantileAccuracy", "10000000")
    try {
      val sketch = Relational.qApproxPercentile(spark, sf)
        .orderBy($"o_orderstatus").collect().toSeq
      assert(sketch == exact)
    } finally spark.conf.unset("spark.graft.quantileAccuracy")
  }
}
