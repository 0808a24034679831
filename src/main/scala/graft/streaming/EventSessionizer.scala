package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization via flatMapGroupsWithState:
  * per-user sessions close after `gapMinutes` of event-time
  * inactivity (watermark-driven timeout), emitting one summary row
  * per closed session. This is the custom-state path the engine needs
  * for stream shapes `session_window` can't express (per-session
  * aggregates beyond count/min/max, emission on close, side state).
  *
  * State is one small struct per active user key — at cluster scale
  * it shards across executors on the group key and journals to the
  * checkpoint via the state store.
  */
object EventSessionizer {

  case class Event(user_id: Long, ts: java.sql.Timestamp, value: Double)

  case class SessionState(
      start: Long, // epoch micros
      lastTs: Long,
      nEvents: Long,
      sumValue: Double)

  case class SessionOut(
      user_id: Long,
      sess_start: java.sql.Timestamp,
      sess_end: java.sql.Timestamp,
      n_events: Long,
      sum_value: Double)

  private def micros(t: java.sql.Timestamp): Long = t.getTime * 1000L

  def updateState(
      gapMs: Long)(
      userId: Long,
      events: Iterator[Event],
      state: GroupState[SessionState]): Iterator[SessionOut] = {

    def toOut(s: SessionState): SessionOut = SessionOut(
      userId,
      new java.sql.Timestamp(s.start / 1000L),
      new java.sql.Timestamp(s.lastTs / 1000L),
      s.nEvents, s.sumValue)

    if (state.hasTimedOut) {
      // watermark passed last event + gap: close and emit
      val out = state.getOption.map(toOut).iterator
      state.remove()
      out.toSeq.iterator
    } else {
      val sorted = events.toSeq.sortBy(e => (micros(e.ts), e.value))
      var closed = List.empty[SessionOut]
      var cur = state.getOption
      sorted.foreach { e =>
        val t = micros(e.ts)
        cur match {
          case Some(s) if t - s.lastTs <= gapMs * 1000L =>
            cur = Some(s.copy(lastTs = math.max(s.lastTs, t),
              nEvents = s.nEvents + 1, sumValue = s.sumValue + e.value))
          case Some(s) =>
            closed ::= toOut(s)
            cur = Some(SessionState(t, t, 1L, e.value))
          case None =>
            cur = Some(SessionState(t, t, 1L, e.value))
        }
      }
      cur.foreach { s =>
        state.update(s)
        state.setTimeoutTimestamp(s.lastTs / 1000L + gapMs)
      }
      closed.reverse.iterator
    }
  }

  /** Wire the sessionizer over a streaming Dataset[Event] (watermark
    * must already be applied by the caller on `ts`).
    */
  def sessionize(
      events: Dataset[Event],
      gapMinutes: Int): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        updateState(gapMinutes * 60 * 1000L))
  }
}
