package graft

import org.scalatest.funsuite.AnyFunSuite

/** SQL-first usage: `Tables.registerViews` + `spark.sql` must reach
  * the same results as the DataFrame operators, including the graft_*
  * functions the extensions register.
  */
class SqlSurfaceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.Sf

  test("spark.sql over registered views equals the DataFrame operator") {
    graft.core.Tables.registerViews(spark, sf)
    val sql = spark.sql(
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity), 2) AS sum_qty,
        | round(sum(l_extendedprice), 2) AS sum_base_price,
        | round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
        | round(avg(l_quantity), 4) AS avg_qty,
        | round(avg(l_discount), 4) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin)
    val df = graft.operators.Relational.q1PricingSummary(spark, sf)
    assert(sql.count() == df.count())
    assert(sql.exceptAll(df).count() == 0 && df.exceptAll(sql).count() == 0)
  }

  test("graft_* SQL functions work over registered views") {
    graft.core.Tables.registerViews(spark, sf)
    import spark.implicits._
    val sims = spark.sql(
      """SELECT vec_id,
        | graft_cosine(transform(embedding, x -> cast(x AS double)),
        |              transform(embedding, x -> cast(x AS double))) AS self_sim
        |FROM embeddings LIMIT 20""".stripMargin)
      .select($"self_sim").as[Double].collect()
    assert(sims.nonEmpty && sims.forall(s => math.abs(s - 1.0) < 1e-9))
    // the aggregate surface resolves and ranks: per-label top-3
    // vec_ids by vec_id-as-score == ORDER BY desc LIMIT 3 per group
    val top = spark.sql(
      """SELECT label, graft_topk(vec_id, cast(vec_id AS double), 3) AS top
        |FROM embeddings GROUP BY label""".stripMargin).collect()
    assert(top.nonEmpty)
    top.foreach { r =>
      val pairs = r.getSeq[org.apache.spark.sql.Row](1)
      assert(pairs.size <= 3 &&
        pairs.map(_.getLong(0)) == pairs.map(_.getLong(0)).sorted.reverse)
    }
  }

  test("windowed session SQL equals evt_sessionize operator") {
    graft.core.Tables.registerViews(spark, sf)
    val sql = spark.sql(
      """WITH x AS (SELECT user_id, event_id, ts, value,
        |   lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |y AS (SELECT *, CASE WHEN prev_ts IS NULL
        |   OR (unix_timestamp(ts) - unix_timestamp(prev_ts)) > 1800
        |   THEN 1 ELSE 0 END AS ns FROM x),
        |z AS (SELECT *, CAST(sum(ns) OVER (PARTITION BY user_id
        |   ORDER BY ts, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |   AS session_id FROM y)
        |SELECT user_id, session_id, count(*) AS n_events,
        | date_trunc('second', min(ts)) AS session_start,
        | round(sum(value), 2) AS session_value
        |FROM z GROUP BY user_id, session_id""".stripMargin)
    val df = graft.operators.Events.evtSessionize(spark, sf)
    assert(sql.count() == df.count())
    assert(sql.exceptAll(df).count() == 0)
  }
}
