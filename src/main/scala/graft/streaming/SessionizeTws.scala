package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import Sessionize.{Evt, EvtT, GapSeconds, OpenSession, Session}

/** The [[Sessionize.sessionizeWithTimeout]] fold re-expressed on
  * `transformWithState` — Spark 4's arbitrary-state operator (SPARK-
  * 46815), the successor to `flatMapGroupsWithState`. Same semantics
  * (30-minute gap, idle sessions close and EVICT when the watermark
  * passes), but the new API composes typed state cells (here one
  * `ValueState`) with explicit timers instead of a single state blob
  * with one implicit timeout, and it runs on the RocksDB state store
  * — the spill-to-disk store that keeps executor heap flat when 100 TB
  * of traffic parks hundreds of millions of open sessions.
  *
  * session_id is the session's first-event timestamp (unique per user
  * across evictions — see [[Sessionize.updateUserTimeout]]).
  */
object SessionizeTws {

  /** Conf required by transformWithState: only the RocksDB provider
    * implements the multi-column-family state layout the operator
    * needs.
    */
  val RocksDbProvider: (String, String) =
    "spark.sql.streaming.stateStore.providerClass" ->
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  class SessionProcessor extends StatefulProcessor[Long, EvtT, Session] {
    @transient private var open: ValueState[OpenSession] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState(
        "open", Encoders.product[OpenSession], TTLConfig.NONE)

    override def handleInputRows(userId: Long, rows: Iterator[EvtT],
                                 tv: TimerValues): Iterator[Session] = {
      val sorted = rows.map(e => Evt(e.user_id, e.ts.getTime / 1000, e.value))
        .toSeq.sortBy(_.ts_sec)
      if (sorted.isEmpty) return Iterator.empty
      var cur = if (open.exists()) open.get() else null
      val out = Seq.newBuilder[Session]
      for (e <- sorted) {
        if (cur == null) {
          cur = OpenSession(e.ts_sec, 0L, 0d, e.ts_sec)
        } else if (e.ts_sec - cur.lastTs > GapSeconds) {
          out += Session(userId, cur.sessionId, cur.n, cur.value, closed = true)
          cur = OpenSession(e.ts_sec, 0L, 0d, e.ts_sec)
        }
        cur = cur.copy(n = cur.n + 1,
                       value = cur.value + e.value, lastTs = e.ts_sec)
      }
      open.update(cur)
      // One timer at the open session's expiry. Earlier batches may
      // have left stale timers behind (timers are keyed by expiry
      // time, and the expiry moves with every new event) — rather
      // than bookkeeping deleteTimer calls, handleExpiredTimer
      // re-checks the state, so a stale firing is a no-op. Clamped
      // above the watermark like the fMGWS twin: a group fed only
      // late data must not register a past-due timer.
      getHandle.registerTimer(
        math.max((cur.lastTs + GapSeconds) * 1000,
                 tv.getCurrentWatermarkInMs() + 1000))
      out.result().iterator
    }

    override def handleExpiredTimer(userId: Long, tv: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[Session] = {
      if (!open.exists()) return Iterator.empty
      val cur = open.get()
      // stale timer from before the session was extended — ignore
      if (info.getExpiryTimeInMs < (cur.lastTs + GapSeconds) * 1000)
        return Iterator.empty
      open.clear()
      Iterator.single(
        Session(userId, cur.sessionId, cur.n, cur.value, closed = true))
    }
  }

  /** Wire the processor onto a (possibly streaming) event Dataset.
    * The session must have [[RocksDbProvider]] set.
    */
  def sessionize(events: Dataset[EvtT]): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "0 seconds")
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor,
        TimeMode.EventTime, OutputMode.Append)
  }
}
