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
}
