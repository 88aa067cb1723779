package graft.tools

import org.apache.spark.sql.functions._

/** Throwaway stage-by-stage profiler for q21_blame_supplier's sf10
  * blowup (r18 verdict item 2; not part of the library surface).
  * Times each pipeline prefix with the bench action and prints the
  * AQE-final executed plan of the full query.
  */
object ProbeQ21 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/bench-data/sf10")
    val spark = graft.core.GraftSession.local(32)
    import spark.implicits._
    def time(tag: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val d = df
      d.queryExecution.toRdd.count()
      println(f"[q21probe] ${(System.nanoTime() - t0) / 1e9}%7.2f s  $tag")
    }
    val o = graft.core.Tables.orders(spark, sfDir)
      .filter($"o_orderstatus" === "F")
      .select($"o_orderkey", $"o_orderdate")
    def joined = graft.core.Tables.lineitem(spark, sfDir)
      .select($"l_orderkey", $"l_suppkey", $"l_shipdate")
      .join(o, $"l_orderkey" === $"o_orderkey")
      .withColumn("late",
        ($"l_shipdate" > $"o_orderdate" + expr("INTERVAL 60 DAYS")).cast("int"))
    def perSupp = joined
      .repartition($"l_orderkey")
      .groupBy($"l_orderkey", $"l_suppkey")
      .agg(max($"late").as("supp_late"))
    def perOrder = perSupp
      .groupBy($"l_orderkey")
      .agg(count(lit(1)).as("n_suppliers"),
           sum($"supp_late").as("n_late_suppliers"),
           max(when($"supp_late" === 1, $"l_suppkey")).as("l_suppkey"))
      .filter($"n_suppliers" >= 2 && $"n_late_suppliers" === 1)
    // SMJ-vs-SHJ A/B on the fact join (guide §3): the orders side is
    // ~12% of lineitem — too big to broadcast at scale, small enough
    // per partition for a shuffled-hash build that skips BOTH sorts
    def perOrderShj = Tables_lineitem3
      .join(o.hint("shuffle_hash"), $"l_orderkey" === $"o_orderkey")
      .withColumn("late",
        ($"l_shipdate" > $"o_orderdate" + expr("INTERVAL 60 DAYS")).cast("int"))
      .repartition($"l_orderkey")
      .groupBy($"l_orderkey", $"l_suppkey")
      .agg(max($"late").as("supp_late"))
      .groupBy($"l_orderkey")
      .agg(count(lit(1)).as("n_suppliers"),
           sum($"supp_late").as("n_late_suppliers"),
           max(when($"supp_late" === 1, $"l_suppkey")).as("l_suppkey"))
      .filter($"n_suppliers" >= 2 && $"n_late_suppliers" === 1)
    def Tables_lineitem3 = graft.core.Tables.lineitem(spark, sfDir)
      .select($"l_orderkey", $"l_suppkey", $"l_shipdate")
    for (pass <- 1 to 3) {
      time(s"p$pass scan lineitem 3col")(Tables_lineitem3)
      time(s"p$pass orders F 2col")(o)
      time(s"p$pass perOrder SMJ (current)")(perOrder)
      time(s"p$pass perOrder SHJ (hint)")(perOrderShj)
      time(s"p$pass FULL q21")(
        graft.operators.Relational.q21BlameSupplier(spark, sfDir))
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc()
    }
    val df = graft.operators.Relational.q21BlameSupplier(spark, sfDir)
    df.queryExecution.toRdd.count()
    println("[q21probe] ===== AQE-final executed plan =====")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
