package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Events

/** Admission-control / watermark batch operators on hand-built event
  * logs with hand-computed expected outputs (the oracle gate checks
  * them against DuckDB on the generated corpus; these pin the
  * SEMANTICS on inputs where the right answer is visible).
  */
class EventOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** rows: (event_id, epoch_s, user_id, event_type, value) */
  private def writeEvents(
      rows: Seq[(Long, Long, Long, String, Double)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-events").toString
    rows.toDF("event_id", "epoch_s", "user_id", "event_type", "value")
      .withColumn("ts", timestamp_seconds($"epoch_s"))
      .withColumn("props", lit("{}"))
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value",
              $"props")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("out-of-order: lateness beyond the 10-min watermark, per partition") {
    import spark.implicits._
    // all ids ≡ 0 mod 8 → single partition; arrival order = id order
    val dir = writeEvents(Seq(
      (0L, 1000L, 1L, "a", 1.0),   // first arrival: no watermark yet
      (8L, 2000L, 1L, "a", 1.0),   // advances the high-water mark
      (16L, 1250L, 2L, "a", 1.0),  // 2000 − 600 − 1250 = 150 s late
      (24L, 2100L, 2L, "a", 1.0),  // ahead of the mark: on time
      (32L, 1400L, 3L, "a", 1.0))) // 2100 − 600 − 1400 = 100 s late
    val r = Events.evtOutOfOrder(spark, dir)
      .select($"partition", $"n_events", $"n_late", $"max_late_s",
              $"total_late_s")
      .as[(Int, Long, Long, Long, Long)].collect()
    assert(r.toSeq == Seq((0, 5L, 2L, 150L, 250L)))
  }

  test("concurrency sweep: overlap peak, midnight clip, hand-computed") {
    import spark.implicits._
    val dir = writeEvents(Seq(
      // user 1: one session [10:00:00, 10:10:01)
      (1L, 36000L, 1L, "a", 1.0), (2L, 36300L, 1L, "a", 1.0),
      (3L, 36600L, 1L, "a", 1.0),
      // user 2: single-event session [10:05:00, 10:05:01) — overlaps u1
      (10L, 36300L, 2L, "a", 1.0),
      // user 4: session spanning midnight [23:50:00, 00:05:01 next day)
      (20L, 85800L, 4L, "a", 1.0), (21L, 86700L, 4L, "a", 1.0)))
    val r = Events.evtConcurrency(spark, dir)
      .select($"day".cast("string"), $"n_sessions", $"peak_concurrent")
      .as[(String, Long, Long)].collect().sortBy(_._1)
    assert(r.toSeq == Seq(
      ("1970-01-01", 3L, 2L),   // u1+u2 overlap at 10:05 → peak 2
      ("1970-01-02", 1L, 1L)))  // u4's carried session alone
  }

  test("log integrity: finds exactly the simulated poll loss") {
    import spark.implicits._
    // ids 0..79 → 8 partitions × offsets 0..9; the audit drops
    // offset 7 per partition, so each partition reports one gap
    val dir = writeEvents((0L to 79L).map(i => (i, 1000L + i, i, "a", 1.0)))
    val r = Events.evtLogIntegrity(spark, dir)
      .select($"partition", $"committed_offset", $"n_consumed",
              $"n_missing")
      .as[(Int, Long, Long, Long)].collect().sortBy(_._1)
    assert(r.toSeq == (0 to 7).map(p => (p, 9L, 9L, 1L)))
  }

  test("rate limit: first 3 per (user, hour) pass, ties impossible by ts") {
    import spark.implicits._
    val h0 = 36000L // hour bucket 1; next hour at +3600
    val dir = writeEvents(
      // user 1 bursts 5 into one hour → 2 throttled
      (0L to 4L).map(i => (i, h0 + 60 * i, 1L, "x", 1.0)) ++
      // user 2 stays under the cap
      Seq((10L, h0 + 10, 2L, "x", 1.0), (11L, h0 + 20, 2L, "x", 1.0)) ++
      // user 1 again next hour: quota resets
      Seq((20L, h0 + 3600, 1L, "x", 1.0), (21L, h0 + 3660, 1L, "x", 1.0)))
    val r = Events.evtRateLimit(spark, dir)
      .select($"event_type", $"n_offered", $"n_kept", $"n_throttled",
              $"kept_value")
      .as[(String, Long, Long, Long, Double)].collect()
    assert(r.toSeq == Seq(("x", 9L, 7L, 2L, 7.0)))
  }

  test("cdc apply: trailing delete removes, delete then re-insert survives, ts tie by event_id") {
    import spark.implicits._
    val dir = writeEvents(Seq(
      // u1: plain insert + update → final image is the update
      (1L, 100L, 1L, "signup", 1.0),
      (2L, 200L, 1L, "click", 5.0),
      // u2: last op is the delete tombstone → absent from the result
      (3L, 100L, 2L, "signup", 1.0),
      (4L, 200L, 2L, "error", 0.0),
      // u3: delete then a LATER update → re-inserted (tombstones mask
      // the past, not the future)
      (5L, 100L, 3L, "signup", 1.0),
      (6L, 200L, 3L, "error", 0.0),
      (7L, 300L, 3L, "view", 7.0),
      // u4: two ops at the SAME ts → higher event_id is the image
      (8L, 100L, 4L, "signup", 1.0),
      (9L, 100L, 4L, "purchase", 9.0)))
    val got = graft.operators.Events.evtCdcApply(spark, dir)
      .as[(Long, String, Double, Long)].collect().toSet
    assert(got == Set((1L, "click", 5.0, 2L),
                      (3L, "view", 7.0, 3L),
                      (4L, "purchase", 9.0, 2L)))
  }

  test("logPartitions knob: partitioner is key mod P, offsets dense per partition") {
    import spark.implicits._
    val dir = writeEvents((0L until 10L).map(i =>
      (i, 1000L + i, i % 2, "a", 1.0)))
    // default P = 8: ids 0..9 → partitions 0..7 plus wraps 8→0, 9→1
    val d = Events.evtProduce(spark, dir)
      .select($"partition", $"offset", $"key")
      .as[(Int, Long, Long)].collect().toSet
    assert(d.map(_._1) == (0 to 7).toSet)
    assert(d.filter(_._1 == 0).map(r => (r._2, r._3)) ==
      Set((0L, 0L), (1L, 8L))) // offsets dense in key order
    sys.props("spark.graft.logPartitions") = "3"
    try {
      val r = Events.evtProduce(spark, dir)
        .select($"partition", $"offset", $"key")
        .as[(Int, Long, Long)].collect()
      assert(r.map(_._1).toSet == Set(0, 1, 2))
      // per-partition offsets are 0..n-1 dense, ordered by key
      r.groupBy(_._1).foreach { case (_, rows) =>
        val sorted = rows.sortBy(_._3).map(_._2).toSeq
        assert(sorted == (0L until rows.length.toLong))
      }
      // multi-topic inherits P/2 (≥1): at P=3 every topic has 1 partition
      val mt = Events.evtMultiTopic(spark, dir)
        .select($"partition").distinct().as[Int].collect().toSet
      assert(mt == Set(0))
    } finally { sys.props.remove("spark.graft.logPartitions"); () }
  }
}
