package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Structured Streaming specs: file source → watermark → windowed agg
  * → memory sink, asserted equal to the batch twin. Micro-batch
  * consumption is the reference consumer's poll loop
  * (`jc/DemoApplication.java:130-160`).
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.Sf

  private def stageEventsDir(): String = {
    val dir = Files.createTempDirectory("graft-stream").toString
    Files.copy(Paths.get(s"$sf/events.parquet"),
      Paths.get(s"$dir/events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    dir
  }

  test("streaming windowed agg equals batch evt_windowed") {
    import spark.implicits._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dir = stageEventsDir()
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
      .transform(graft.core.Tables.withEventTs)
      .withWatermark("ts", "1 hour")
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n_events"), round(sum($"value"), 2).as("total_value"))
    val q = stream.writeStream.outputMode("complete")
      .format("memory").queryName("win_out").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("win_out")
      .select($"window.start".as("window_start"), $"event_type",
              $"n_events", $"total_value")
    val want = graft.operators.Events.evtWindowed(spark, sf)
    assert(got.count() == want.count())
    assert(got.exceptAll(want).count() == 0)
    assert(want.exceptAll(got).count() == 0)
  }

  test("streaming windowed top-k: in-stream hourly agg + rank on the sink equals batch evt_top_types") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dir = stageEventsDir()
    val schema = spark.read.parquet(dir).schema
    // rank is not a streaming operator — the streamable part is the
    // windowed aggregate; the top-k selection runs on the (already
    // tiny, ≤ #types per window) sink table. Same split a production
    // job makes: heavy reduction in-stream, cheap rank downstream.
    val stream = spark.readStream.schema(schema).parquet(dir)
      .transform(graft.core.Tables.withEventTs)
      .groupBy(date_trunc("hour", $"ts").as("window_start"), $"event_type")
      .agg(count(lit(1)).as("n_events"), round(sum($"value"), 2).as("total_value"))
    val q = stream.writeStream.outputMode("complete")
      .format("memory").queryName("toptypes_agg").start()
    try q.processAllAvailable() finally q.stop()
    val w = Window.partitionBy($"window_start")
      .orderBy($"n_events".desc, $"event_type")
    val got = spark.table("toptypes_agg")
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter($"rank" <= 2)
      .collect().toSet
    val want = graft.operators.Events.evtTopTypes(spark, sf).collect().toSet
    assert(got == want, "streaming top-k diverges from batch twin")
  }

  test("streaming query checkpoints and resumes (offset replay)") {
    import spark.implicits._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dir = stageEventsDir()
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    val outName = "resume_out"
    val schema = spark.read.parquet(dir).schema

    def run(): Long = {
      val q = spark.readStream.schema(schema).parquet(dir)
        .groupBy().count()
        .writeStream.outputMode("complete")
        .option("checkpointLocation", ckpt)
        .format("memory").queryName(outName).start()
      try { q.processAllAvailable() } finally q.stop()
      spark.table(outName).as[Long].head()
    }
    assert(run() == 1000)
    // second run from the same checkpoint: no new files → no new data,
    // the committed offsets (consumer position) carry over
    val q2 = spark.readStream.schema(schema).parquet(dir)
      .groupBy().count()
      .writeStream.outputMode("complete")
      .option("checkpointLocation", ckpt)
      .format("memory").queryName("resume_out2").start()
    try { q2.processAllAvailable() } finally q2.stop()
    assert(q2.lastProgress == null ||
           q2.lastProgress.numInputRows == 0)
  }

  test("stream-stream join: clicks x purchases per user within 1h, equals batch twin") {
    import spark.implicits._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dir = stageEventsDir()
    val schema = spark.read.parquet(dir).schema
    def streamEvents() = spark.readStream.schema(schema).parquet(dir)
      .transform(graft.core.Tables.withEventTs)
    val clicks = streamEvents().filter($"event_type" === "click")
      .select($"user_id", $"event_id".as("click_id"), $"ts".as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    val purchases = streamEvents().filter($"event_type" === "purchase")
      .select($"user_id".as("p_user_id"), $"event_id".as("purchase_id"),
              $"ts".as("purchase_ts"))
      .withWatermark("purchase_ts", "1 hour")
    val joined = clicks.join(purchases,
      $"user_id" === $"p_user_id" &&
      $"purchase_ts" >= $"click_ts" &&
      $"purchase_ts" <= $"click_ts" + expr("INTERVAL 1 HOUR"))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssj_out").start()
    try q.processAllAvailable() finally q.stop()

    val ev = graft.core.Tables.events(spark, sf)
    val bc = ev.filter($"event_type" === "click")
      .select($"user_id", $"event_id".as("click_id"), $"ts".as("click_ts"))
    val bp = ev.filter($"event_type" === "purchase")
      .select($"user_id".as("p_user_id"), $"event_id".as("purchase_id"),
              $"ts".as("purchase_ts"))
    val want = bc.join(bp,
      $"user_id" === $"p_user_id" &&
      $"purchase_ts" >= $"click_ts" &&
      $"purchase_ts" <= $"click_ts" + expr("INTERVAL 1 HOUR"))
      .select($"click_id", $"purchase_id")
    val got = spark.table("ssj_out").select($"click_id", $"purchase_id")
    assert(got.count() == want.count() && want.count() > 0)
    assert(got.exceptAll(want).count() == 0)
  }

  test("stream-stream LEFT OUTER join emits null rows once the watermark closes the interval") {
    import spark.implicits._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dir = stageEventsDir()
    val schema = spark.read.parquet(dir).schema
    def streamEvents() = spark.readStream.schema(schema).parquet(dir)
      .transform(graft.core.Tables.withEventTs)
    val clicks = streamEvents().filter($"event_type" === "click")
      .select($"user_id", $"event_id".as("click_id"), $"ts".as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    val purchases = streamEvents().filter($"event_type" === "purchase")
      .select($"user_id".as("p_user_id"), $"event_id".as("purchase_id"),
              $"ts".as("purchase_ts"))
      .withWatermark("purchase_ts", "1 hour")
    val joined = clicks.join(purchases,
      $"user_id" === $"p_user_id" &&
      $"purchase_ts" >= $"click_ts" &&
      $"purchase_ts" <= $"click_ts" + expr("INTERVAL 1 HOUR"),
      "left_outer")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssj_outer").start()
    try {
      q.processAllAvailable()
      // Outer-null rows only emit AFTER the watermark passes each
      // click's interval upper bound — push BOTH watermarks (the
      // global watermark is the min across them) three hours past the
      // corpus with one click and one purchase, on users that cannot
      // match each other (the pusher rows park in state, unemitted).
      val ev = graft.core.Tables.events(spark, sf)
      // ts is TIMESTAMP_NTZ in the staged files: read the max as a
      // LocalDateTime and append pusher rows with the same NTZ encoding
      // so the directory schema stays homogeneous for the file source
      val maxTs = spark.read.parquet(dir).agg(max($"ts")).head()
        .getAs[java.time.LocalDateTime](0)
      Seq((9000001L, maxTs.plusHours(3), 9000001L, "click", 0.0, "{}"),
          (9000002L, maxTs.plusHours(3), 9000002L, "purchase", 0.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()

      val bc = ev.filter($"event_type" === "click")
        .select($"user_id", $"event_id".as("click_id"), $"ts".as("click_ts"))
      val bp = ev.filter($"event_type" === "purchase")
        .select($"user_id".as("p_user_id"), $"event_id".as("purchase_id"),
                $"ts".as("purchase_ts"))
      val want = bc.join(bp,
        $"user_id" === $"p_user_id" &&
        $"purchase_ts" >= $"click_ts" &&
        $"purchase_ts" <= $"click_ts" + expr("INTERVAL 1 HOUR"),
        "left_outer")
        .select($"click_id", $"purchase_id")
      val got = spark.table("ssj_outer").select($"click_id", $"purchase_id")
      assert(want.filter($"purchase_id".isNull).count() > 0,
        "batch twin has no unmatched clicks — outer semantics untested")
      assert(got.count() == want.count())
      assert(got.exceptAll(want).count() == 0)
      assert(want.exceptAll(got).count() == 0)
    } finally q.stop()
  }

  test("stream-stream FULL OUTER join emits null rows on BOTH sides under the watermark") {
    import spark.implicits._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dir = stageEventsDir()
    val schema = spark.read.parquet(dir).schema
    def streamEvents() = spark.readStream.schema(schema).parquet(dir)
      .transform(graft.core.Tables.withEventTs)
    val clicks = streamEvents().filter($"event_type" === "click")
      .select($"user_id", $"event_id".as("click_id"), $"ts".as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    val purchases = streamEvents().filter($"event_type" === "purchase")
      .select($"user_id".as("p_user_id"), $"event_id".as("purchase_id"),
              $"ts".as("purchase_ts"))
      .withWatermark("purchase_ts", "1 hour")
    val joined = clicks.join(purchases,
      $"user_id" === $"p_user_id" &&
      $"purchase_ts" >= $"click_ts" &&
      $"purchase_ts" <= $"click_ts" + expr("INTERVAL 1 HOUR"),
      "full_outer")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssj_full").start()
    try {
      q.processAllAvailable()
      // same watermark-pusher trick as the LEFT OUTER scenario: both
      // sides' null-complemented rows only emit once the watermark
      // passes their interval bound; the pusher pair parks in state
      val ev = graft.core.Tables.events(spark, sf)
      // ts is TIMESTAMP_NTZ in the staged files: read the max as a
      // LocalDateTime and append pusher rows with the same NTZ encoding
      // so the directory schema stays homogeneous for the file source
      val maxTs = spark.read.parquet(dir).agg(max($"ts")).head()
        .getAs[java.time.LocalDateTime](0)
      Seq((9000001L, maxTs.plusHours(3), 9000001L, "click", 0.0, "{}"),
          (9000002L, maxTs.plusHours(3), 9000002L, "purchase", 0.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()

      val bc = ev.filter($"event_type" === "click")
        .select($"user_id", $"event_id".as("click_id"), $"ts".as("click_ts"))
      val bp = ev.filter($"event_type" === "purchase")
        .select($"user_id".as("p_user_id"), $"event_id".as("purchase_id"),
                $"ts".as("purchase_ts"))
      val want = bc.join(bp,
        $"user_id" === $"p_user_id" &&
        $"purchase_ts" >= $"click_ts" &&
        $"purchase_ts" <= $"click_ts" + expr("INTERVAL 1 HOUR"),
        "full_outer")
        .select($"click_id", $"purchase_id")
      val got = spark.table("ssj_full").select($"click_id", $"purchase_id")
      // both null directions must be non-vacuous or the mode is untested
      assert(want.filter($"purchase_id".isNull).count() > 0,
        "batch twin has no unmatched clicks — full-outer click side untested")
      assert(want.filter($"click_id".isNull).count() > 0,
        "batch twin has no unmatched purchases — full-outer purchase side untested")
      assert(got.count() == want.count())
      assert(got.exceptAll(want).count() == 0)
      assert(want.exceptAll(got).count() == 0)
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark dedupes redelivered events in-stream") {
    import spark.implicits._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dir = stageEventsDir()
    // redelivery: the same file lands twice (at-least-once source)
    Files.copy(Paths.get(s"$sf/events.parquet"),
      Paths.get(s"$dir/events_redelivered.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    val schema = spark.read.parquet(dir).schema
    val n = spark.read.parquet(dir).count()
    val distinctIds = spark.read.parquet(dir).select("event_id").distinct().count()
    assert(n == 2 * distinctIds)
    val q = spark.readStream.schema(schema).parquet(dir)
      .transform(graft.core.Tables.withEventTs)
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy().count()
      .writeStream.outputMode("complete")
      .format("memory").queryName("ddww_out").start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.table("ddww_out").as[Long].head() == distinctIds)
  }

  test("stream-static enrichment join equals batch evt_enrich") {
    import spark.implicits._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dir = stageEventsDir()
    val schema = spark.read.parquet(dir).schema
    // static dimension side: broadcast per micro-batch, no state store
    val c = graft.core.Tables.customer(spark, sf)
    val n = graft.core.Tables.nation(spark, sf)
    val enriched = spark.readStream.schema(schema).parquet(dir)
      .join(broadcast(c), $"user_id" === $"c_custkey")
      .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name", $"event_type")
      .agg(count(lit(1)).as("n_events"), round(sum($"value"), 2).as("total_value"))
    val q = enriched.writeStream.outputMode("complete")
      .format("memory").queryName("enrich_out").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("enrich_out")
    val want = graft.operators.Events.evtEnrich(spark, sf)
    assert(got.count() == want.count() && want.count() > 0)
    assert(got.exceptAll(want).count() == 0)
  }

  test("watermark drops events later than the lateness bound") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    // run 1 sees 12:00 and 15:00 events and checkpoints a 14:00
    // watermark; run 2 (same checkpoint, so the watermark RESTORES)
    // receives a 12:30 straggler — beyond the 1-hour bound, so its
    // 999 must never reach an emitted window total. File sink +
    // checkpoint: exactly how a production backfill would resume.
    val dir = Files.createTempDirectory("graft-late").toString
    val data = Files.createDirectory(Paths.get(dir, "in")).toString
    def write(name: String, ts: String, v: Long): Unit =
      Seq((ts, v)).toDF("ts_s", "v")
        .select(to_timestamp($"ts_s").as("ts"), $"v")
        .coalesce(1).write.parquet(s"$data/$name")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.LongType)))
    def run(): Unit = {
      val q = spark.readStream.schema(schema).parquet(s"$data/*")
        .withWatermark("ts", "1 hour")
        .groupBy(window($"ts", "1 hour")).agg(sum($"v").as("total"))
        .select($"window.start".as("wstart"), $"total")
        .writeStream.format("parquet").option("path", s"$dir/out")
        .outputMode("append").trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"$dir/ckpt").start()
      q.awaitTermination(120000)
    }
    write("b1", "2015-06-01 12:00:00", 1L)
    write("b2", "2015-06-01 15:00:00", 100L)
    run()
    write("b3", "2015-06-01 12:30:00", 999L)
    run()
    val emitted = spark.read.parquet(s"$dir/out")
      .select($"wstart".cast("string"), $"total")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!emitted.values.exists(_ >= 999L),
      s"late event leaked into emitted windows: $emitted")
    assert(emitted.values.exists(_ == 1L), s"on-time window missing: $emitted")
  }

  test("multi-topic streaming union: one subscribed stream with a topic column") {
    import spark.implicits._
    import graft.streaming.EventLog
    // the streaming twin of EventLog.pollMany: subscribe to N topics
    // as ONE stream (what a Kafka `subscribe=a,b` source yields),
    // distinguished by the topic column
    val base = Files.createTempDirectory("graft-substream").toString
    val a = new EventLog(base + "/a", numPartitions = 4)
    val b = new EventLog(base + "/b", numPartitions = 4)
    a.produce(spark.range(0, 120)
      .select($"id".cast("string").as("key"), concat(lit("a#"), $"id").as("payload")))
    b.produce(spark.range(0, 30)
      .select($"id".cast("string").as("key"), concat(lit("b#"), $"id").as("payload")))
    val stream = a.readStream(spark).withColumn("topic", lit("a"))
      .unionByName(b.readStream(spark).withColumn("topic", lit("b")))
    val q = stream.writeStream.format("memory").queryName("multi_sink")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val counts = spark.table("multi_sink").groupBy($"topic").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("a" -> 120L, "b" -> 30L))
  }

  test("streaming dead-letter split: poison messages land in the DLQ topic") {
    import spark.implicits._
    import graft.streaming.EventLog
    // the streaming form of evt_error_routing: one foreachBatch
    // splits each micro-batch into the main sink and a DLQ topic —
    // the reference handler's throw-on-malformed path, made durable
    val base = Files.createTempDirectory("graft-dlq").toString
    val src = new EventLog(base + "/src", numPartitions = 4)
    val ok = new EventLog(base + "/ok", numPartitions = 4)
    val dlq = new EventLog(base + "/dlq", numPartitions = 4)
    // every 5th payload is malformed (no parseable number after '#')
    src.produce(spark.range(0, 200)
      .select($"id".cast("string").as("key"),
        when($"id" % 5 === 0, lit("#corrupt"))
          .otherwise(concat(lit("#"), $"id")).as("payload")))
    val q = src.readStream(spark).writeStream
      .option("checkpointLocation", s"$base/ckpt")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val tagged = batch.withColumn("parsed",
          expr("try_cast(substring(payload, 2, 100) as bigint)"))
        ok.produce(tagged.filter($"parsed".isNotNull).select("key", "payload"))
        dlq.produce(tagged.filter($"parsed".isNull).select("key", "payload"))
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(ok.consume(spark).count() == 160)
    assert(dlq.consume(spark).count() == 40)
    // nothing lost, nothing duplicated, and the DLQ holds only poison
    assert(dlq.consume(spark).filter($"payload" =!= "#corrupt").count() == 0)
  }

  test("at-least-once topic delivery dedupes to exactly-once downstream") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-dup-topic").toString + "/t"
    val log = new graft.streaming.EventLog(dir, numPartitions = 4)
    def batch() = spark.range(0, 200)
      .select($"id".cast("string").as("key"), concat(lit("#"), $"id").as("payload"))
    log.produce(batch())
    log.produce(batch())   // duplicate delivery (at-least-once producer retry)
    assert(log.consume(spark).count() == 400)
    // streaming consumer dedupes on the message key
    val q = log.readStream(spark)
      .dropDuplicates("key")
      .groupBy().count()
      .writeStream.outputMode("complete")
      .format("memory").queryName("dedup_out").start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.table("dedup_out").as[Long].head() == 200)
  }
}
