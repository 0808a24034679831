package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.EventSessionizer
import graft.streaming.EventSessionizer.Event

/** Drive the stateful sessionizer through a MemoryStream: sessions
  * close when the watermark passes last-event + gap, not before.
  */
class EventSessionizerSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int) =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("sessions emit on event-time timeout with correct aggregates") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val sessions = EventSessionizer.sessionize(
      input.toDS().withWatermark("ts", "0 seconds").as[Event],
      gapMinutes = 10)

    val query = sessions.writeStream
      .format("memory").queryName("sessions_out")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      // user 1: two events 5 min apart (one session, sum 3.0);
      // user 2: one event
      input.addData(
        Event(1L, ts(0), 1.0), Event(1L, ts(5), 2.0), Event(2L, ts(1), 9.0))
      query.processAllAvailable()
      assert(spark.table("sessions_out").count() == 0) // nothing closed yet

      // advance event time far past both sessions' gap windows
      input.addData(Event(3L, ts(40), 0.5))
      query.processAllAvailable()
      // one more batch so the new watermark fires the timeouts
      input.addData(Event(3L, ts(41), 0.5))
      query.processAllAvailable()

      val out = spark.table("sessions_out")
        .orderBy("user_id").collect()
      assert(out.length == 2, spark.table("sessions_out").collect().toSeq)
      val u1 = out(0)
      assert(u1.getLong(0) == 1L)
      assert(u1.getTimestamp(1) == ts(0) && u1.getTimestamp(2) == ts(5))
      assert(u1.getLong(3) == 2L && u1.getDouble(4) == 3.0)
      val u2 = out(1)
      assert(u2.getLong(0) == 2L && u2.getLong(3) == 1L)
    } finally query.stop()
  }

  test("in-batch gap splits into two sessions, first emits immediately") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val sessions = EventSessionizer.sessionize(
      input.toDS().withWatermark("ts", "0 seconds").as[Event],
      gapMinutes = 5)
    val query = sessions.writeStream
      .format("memory").queryName("sessions_split")
      .outputMode("append").start()
    try {
      // events 20 min apart in ONE batch: first session closes inline
      input.addData(Event(7L, ts(0), 1.0), Event(7L, ts(20), 1.0))
      query.processAllAvailable()
      val closed = spark.table("sessions_split").collect()
      assert(closed.length == 1)
      assert(closed(0).getTimestamp(1) == ts(0))
      assert(closed(0).getLong(3) == 1L)
    } finally query.stop()
  }
}
