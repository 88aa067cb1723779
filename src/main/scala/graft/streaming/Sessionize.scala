package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful sessionization with `flatMapGroupsWithState` — the
  * Structured Streaming twin of the batch `Events.evtSessionize`
  * (same 30-minute gap rule; StatefulSpec asserts they agree).
  *
  * State per user is O(1) — only the open session's accumulator, never
  * the event history — so state size at 100 TB is bounded by the
  * number of live keys, not traffic.
  */
object Sessionize {

  val GapSeconds: Long = 30 * 60

  case class Evt(user_id: Long, ts_sec: Long, value: Double)
  case class OpenSession(sessionId: Long, n: Long, value: Double, lastTs: Long)
  case class Session(user_id: Long, session_id: Long, n_events: Long,
                     session_value: Double, closed: Boolean)

  /** Per-user state transition: events (sorted by time within the
    * group) extend the open session or close it and start the next.
    * Emits closed sessions plus a snapshot of the open one, so a
    * bounded stream's final emission set equals the batch result.
    */
  def updateUser(userId: Long, events: Iterator[Evt],
                 state: GroupState[OpenSession]): Iterator[Session] = {
    val sorted = events.toSeq.sortBy(_.ts_sec)
    if (sorted.isEmpty) return Iterator.empty
    var open = state.getOption.orNull
    val out = Seq.newBuilder[Session]
    for (e <- sorted) {
      if (open == null) {
        open = OpenSession(1L, 0L, 0d, e.ts_sec)
      } else if (e.ts_sec - open.lastTs > GapSeconds) {
        out += Session(userId, open.sessionId, open.n, open.value, closed = true)
        open = OpenSession(open.sessionId + 1, 0L, 0d, e.ts_sec)
      }
      open = open.copy(n = open.n + 1,
                       value = open.value + e.value, lastTs = e.ts_sec)
    }
    state.update(open)
    out += Session(userId, open.sessionId, open.n, open.value, closed = false)
    out.result().iterator
  }

  /** Wire the sessionizer onto a (possibly streaming) event Dataset. */
  def sessionize(events: Dataset[Evt]): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(updateUser)
  }

  /** Event-shape with a real timestamp column (watermark target). */
  case class EvtT(user_id: Long, ts: java.sql.Timestamp, value: Double)

  /** Per-user transition with EVENT-TIME TIMEOUT: identical session
    * fold, but the open session registers a timeout at lastTs + gap —
    * when the watermark passes it, the state entry emits as a closed
    * session and is REMOVED. Without this, every user who stops
    * sending events parks an open session in the state store forever;
    * with it, state size is bounded by the ACTIVE key count, which is
    * the property that keeps a 100 TB stream's state store finite.
    * Emits closed sessions only (Append-mode compatible).
    *
    * session_id here is the session's FIRST-EVENT timestamp, not a
    * per-state counter: eviction erases a counter, so the next event
    * would restart at 1 and collide with a (user, session) key already
    * emitted downstream. The start timestamp survives eviction by
    * construction — a new session after the gap necessarily starts at
    * a later ts, so ids stay unique per user across evictions.
    */
  def updateUserTimeout(userId: Long, events: Iterator[EvtT],
                        state: GroupState[OpenSession]): Iterator[Session] = {
    if (state.hasTimedOut) {
      val open = state.get
      state.remove()
      return Iterator.single(
        Session(userId, open.sessionId, open.n, open.value, closed = true))
    }
    val sorted = events.map(e => Evt(e.user_id, e.ts.getTime / 1000, e.value))
      .toSeq.sortBy(_.ts_sec)
    if (sorted.isEmpty) return Iterator.empty
    var open = state.getOption.orNull
    val out = Seq.newBuilder[Session]
    for (e <- sorted) {
      if (open == null) {
        open = OpenSession(e.ts_sec, 0L, 0d, e.ts_sec)
      } else if (e.ts_sec - open.lastTs > GapSeconds) {
        out += Session(userId, open.sessionId, open.n, open.value, closed = true)
        open = OpenSession(e.ts_sec, 0L, 0d, e.ts_sec)
      }
      open = open.copy(n = open.n + 1,
                       value = open.value + e.value, lastTs = e.ts_sec)
    }
    state.update(open)
    // flatMapGroupsWithState does NOT drop late rows, so a group fed
    // only data older than the watermark would compute a timeout in
    // the past — which Spark rejects at runtime. Clamp to just above
    // the current watermark: the session then expires at the next
    // watermark advance, the correct semantics for an already-stale key.
    state.setTimeoutTimestamp(
      math.max((open.lastTs + GapSeconds) * 1000,
               state.getCurrentWatermarkMs() + 1000))
    out.result().iterator
  }

  /** Streaming sessionizer with idle-session expiry: watermark on the
    * event time drives the timeouts that close and evict idle
    * sessions from the state store.
    */
  def sessionizeWithTimeout(events: Dataset[EvtT]): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "0 seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(updateUserTimeout)
  }
}
