package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Skew

/** Scale-technique specs: salted joins, bucketed co-located joins,
  * and a file-sink streaming pipeline — the mechanisms SURVEY §5
  * claims for the 100 TB story, each proven behaviorally.
  */
class ScaleSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.Sf

  test("salted join equals plain join") {
    import spark.implicits._
    val events = graft.core.Tables.events(spark, sf)
    val customer = graft.core.Tables.customer(spark, sf)
      .withColumnRenamed("c_custkey", "user_id")
    val plain = events.join(customer, Seq("user_id"))
    val salted = Skew.saltedJoin(events, customer, "user_id", 7)
    assert(salted.count() == plain.count())
    val a = salted.groupBy($"user_id").count()
    val b = plain.groupBy($"user_id").count()
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("bucketed tables join without a shuffle exchange") {
    import spark.implicits._
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      graft.core.Tables.orders(spark, sf).write
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("orders_bkt")
      graft.core.Tables.lineitem(spark, sf).write
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("lineitem_bkt")
      val joined = spark.table("lineitem_bkt")
        .join(spark.table("orders_bkt"), $"l_orderkey" === $"o_orderkey")
      val out = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(out)) { joined.explain("simple") }
      val plan = out.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() ==
        graft.core.Tables.lineitem(spark, sf).join(
          graft.core.Tables.orders(spark, sf),
          $"l_orderkey" === $"o_orderkey").count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
      spark.sql("DROP TABLE IF EXISTS lineitem_bkt")
    }
  }

  test("streaming pipeline writes a parquet sink with checkpointing") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-sink-topic").toString + "/t"
    val outDir = java.nio.file.Files.createTempDirectory("graft-sink-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sink-ckpt").toString
    val log = new graft.streaming.EventLog(dir, numPartitions = 4)
    log.produce(spark.range(0, 500)
      .select($"id".cast("string").as("key"), concat(lit("#"), $"id").as("payload")))
    val q = log.readStream(spark)
      .filter($"partition" =!= 0)
      .select($"partition", $"offset", $"key", $"payload")
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val written = spark.read.parquet(outDir)
    assert(written.count() == log.consume(spark).filter($"partition" =!= 0).count())
    assert(written.filter($"partition" === 0).count() == 0)
  }

  test("seeded sampling is deterministic; stratified sampleBy hits per-stratum fractions") {
    import spark.implicits._
    val o = graft.core.Tables.orders(spark, sf)
    val n = o.count()
    val s1 = o.sample(withReplacement = false, 0.1, seed = 42)
    val s2 = o.sample(withReplacement = false, 0.1, seed = 42)
    assert(s1.count() == s2.count())
    assert(s1.exceptAll(s2).count() == 0, "same seed must give the same sample")
    assert(math.abs(s1.count().toDouble / n - 0.1) < 0.05)
    // stratified: downsample one status, keep another
    val strat = o.stat.sampleBy("o_orderstatus",
      Map[Any, Double]("F" -> 0.05, "O" -> 0.5, "P" -> 1.0), seed = 42)
    val byStatus = strat.groupBy($"o_orderstatus").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = o.groupBy($"o_orderstatus").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStatus.getOrElse("P", 0L) == full("P"), "fraction 1.0 keeps everything")
    assert(byStatus.getOrElse("F", 0L) < full("F") / 5, "fraction .05 downsampled")
  }

  test("HLL sketches reaggregate: daily sketches union to monthly, within 5% of exact") {
    import spark.implicits._
    // THE mergeable-sketch pattern at 100 TB: per-day sketches are
    // tiny fixed-size summaries that re-merge to any coarser grain
    // without rescanning the events — distinct counts become an
    // O(sketch) rollup instead of an O(corpus) re-shuffle
    val e = graft.core.Tables.events(spark, sf)
      .select(date_trunc("month", $"ts").as("month"),
              to_date($"ts").as("day"), $"user_id")
    val daily = e.groupBy($"month", $"day")
      .agg(expr("hll_sketch_agg(user_id)").as("sk"))
    val monthlyEst = daily.groupBy($"month")
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
    val exact = e.groupBy($"month")
      .agg(countDistinct($"user_id").as("exact"))
    val bad = monthlyEst.join(exact, "month")
      .filter(abs($"est" - $"exact") > $"exact" * 0.05)
      .count()
    assert(bad == 0, "merged HLL estimate drifted >5% from exact")
  }

  test("date-partitioned writes prune partitions on read") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-partlake").toString
    graft.core.Tables.events(spark, sf)
      .withColumn("event_date", to_date($"ts"))
      .write.mode("overwrite").partitionBy("event_date").parquet(out)
    val pruned = spark.read.parquet(out)
      .filter($"event_date" === "2024-01-05")
    val cap = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(cap)) { pruned.explain("formatted") }
    val plan = cap.toString
    assert(plan.contains("PartitionFilters"), plan)
    assert(!plan.contains("PartitionFilters: []"), "partition filter not applied")
    val want = graft.core.Tables.events(spark, sf)
      .filter(to_date($"ts") === "2024-01-05").count()
    assert(pruned.count() == want)
  }
}
