package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.Sessionize

/** flatMapGroupsWithState sessionizer vs the batch window/lag twin. */
class StatefulSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.Sf

  test("stateful sessionization equals batch evt_sessionize") {
    import spark.implicits._
    val evts = graft.core.Tables.events(spark, sf)
      .select($"user_id", unix_timestamp($"ts").as("ts_sec"), $"value")
      .as[Sessionize.Evt]
    val got = Sessionize.sessionize(evts)
      .groupBy($"user_id", $"session_id")
      .agg(max($"n_events").as("n_events"),
           round(max($"session_value"), 2).as("session_value"))
    val want = graft.operators.Events.evtSessionize(spark, sf)
      .select($"user_id", $"session_id", $"n_events", $"session_value")
    assert(got.count() == want.count())
    assert(got.exceptAll(want).count() == 0)
  }

  test("event-time timeout closes and evicts idle sessions as the watermark advances") {
    import spark.implicits._
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("graft-timeout").toString
    def writeBatch(name: String, rows: Seq[(Long, Long, Double)]): Unit =
      rows.toDF("user_id", "ts_sec", "value")
        .select($"user_id", timestamp_seconds($"ts_sec").as("ts"), $"value")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/stage-$name")
        // file-source dirs must only gain files; stage then move one in
    def promote(name: String): Unit = {
      val src = Files.list(Paths.get(s"$dir/stage-$name")).iterator()
      var i = 0
      while (src.hasNext) {
        val f = src.next()
        if (f.toString.endsWith(".parquet")) {
          Files.createDirectories(Paths.get(s"$dir/in"))
          Files.move(f, Paths.get(s"$dir/in/$name-$i.parquet")); i += 1
        }
      }
    }
    val t0 = 1600000000L
    writeBatch("one", Seq((1L, t0, 1.0), (1L, t0 + 60, 2.0))); promote("one")
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "user_id BIGINT, ts TIMESTAMP, value DOUBLE")
    val stream = spark.readStream.schema(schema).parquet(s"$dir/in")
      .as[Sessionize.EvtT]
    val q = Sessionize.sessionizeWithTimeout(stream)
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$dir/ckpt")
      .format("memory").queryName("timeout_sessions").start()
    try {
      q.processAllAvailable()
      // watermark is only t0+60: user 1's session is open, nothing emitted
      assert(spark.table("timeout_sessions").count() == 0)
      // a much later event advances the watermark past t0 + gap…
      writeBatch("two", Seq((2L, t0 + 4 * 3600, 5.0))); promote("two")
      q.processAllAvailable()
      // …and one more batch lets the post-advance timeout sweep run
      writeBatch("three", Seq((2L, t0 + 4 * 3600 + 60, 6.0))); promote("three")
      q.processAllAvailable()
      val closed = spark.table("timeout_sessions")
        .filter($"user_id" === 1 && $"closed")
      assert(closed.count() == 1, "idle session was not closed by timeout")
      val row = closed.collect().head
      assert(row.getAs[Long]("n_events") == 2)
      assert(row.getAs[Double]("session_value") == 3.0)
      // user 1 returns AFTER eviction: the new session must not reuse
      // the evicted session's id (ids are start timestamps, monotone)
      writeBatch("four", Seq((1L, t0 + 5 * 3600, 9.0))); promote("four")
      q.processAllAvailable()
      writeBatch("five", Seq((2L, t0 + 9 * 3600, 1.0))); promote("five")
      q.processAllAvailable()
      writeBatch("six", Seq((2L, t0 + 9 * 3600 + 60, 1.0))); promote("six")
      q.processAllAvailable()
      val u1 = spark.table("timeout_sessions")
        .filter($"user_id" === 1 && $"closed").collect()
      assert(u1.length == 2, "post-eviction session did not close")
      assert(u1.map(_.getAs[Long]("session_id")).distinct.length == 2,
        "session_id collided across an eviction")
    } finally q.stop()
  }

  test("transformWithState sessionizer: same semantics on the RocksDB state store") {
    // newSession: independent SQLConf, so the RocksDB provider (which
    // transformWithState requires) doesn't leak into suites using the
    // default HDFS-backed store
    val s2 = spark.newSession()
    s2.conf.set(graft.streaming.SessionizeTws.RocksDbProvider._1,
                graft.streaming.SessionizeTws.RocksDbProvider._2)
    import s2.implicits._
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("graft-tws").toString
    def writeBatch(name: String, rows: Seq[(Long, Long, Double)]): Unit =
      rows.toDF("user_id", "ts_sec", "value")
        .select($"user_id", timestamp_seconds($"ts_sec").as("ts"), $"value")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/stage-$name")
    def promote(name: String): Unit = {
      val src = Files.list(Paths.get(s"$dir/stage-$name")).iterator()
      var i = 0
      while (src.hasNext) {
        val f = src.next()
        if (f.toString.endsWith(".parquet")) {
          Files.createDirectories(Paths.get(s"$dir/in"))
          Files.move(f, Paths.get(s"$dir/in/$name-$i.parquet")); i += 1
        }
      }
    }
    val t0 = 1600000000L
    // two sessions for user 1 inside one batch (gap > 30 min) plus an
    // open tail; user 2 advances the watermark to sweep the timer
    writeBatch("one", Seq((1L, t0, 1.0), (1L, t0 + 60, 2.0),
                          (1L, t0 + 7200, 4.0))); promote("one")
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "user_id BIGINT, ts TIMESTAMP, value DOUBLE")
    val stream = s2.readStream.schema(schema).parquet(s"$dir/in")
      .as[graft.streaming.Sessionize.EvtT]
    val q = graft.streaming.SessionizeTws.sessionize(stream)
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$dir/ckpt")
      .format("memory").queryName("tws_sessions").start()
    try {
      q.processAllAvailable()
      // the in-batch gap close emits immediately (no timer needed)
      val first = s2.table("tws_sessions").collect()
      assert(first.length == 1)
      assert(first.head.getAs[Long]("n_events") == 2)
      assert(first.head.getAs[Double]("session_value") == 3.0)
      writeBatch("two", Seq((2L, t0 + 8 * 3600, 5.0))); promote("two")
      q.processAllAvailable()
      writeBatch("three", Seq((2L, t0 + 8 * 3600 + 60, 6.0))); promote("three")
      q.processAllAvailable()
      val u1closed = s2.table("tws_sessions")
        .filter($"user_id" === 1 && $"closed").collect()
      assert(u1closed.length == 2, "idle session not closed by the timer")
      assert(u1closed.map(_.getAs[Long]("session_id")).distinct.length == 2)
      val timedOut = u1closed.maxBy(_.getAs[Long]("session_id"))
      assert(timedOut.getAs[Long]("n_events") == 1)
      assert(timedOut.getAs[Double]("session_value") == 4.0)
    } finally q.stop()
  }
}
