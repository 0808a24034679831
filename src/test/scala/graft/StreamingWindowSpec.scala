package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming tumbling-window aggregation with watermark-driven
  * finalization — the streaming rendering of q_w_tumbling_hour.
  * Append mode only emits a window once the watermark passes its end;
  * late rows inside the watermark still count, rows beyond it drop.
  */
class StreamingWindowSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int, s: Int = 0) =
    Timestamp.valueOf(f"2024-01-01 10:$m%02d:$s%02d")

  test("windows close at the watermark; late-but-in-watermark rows count") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Double)]
    val agg = input.toDF().toDF("ts", "value")
      .withWatermark("ts", "2 minutes")
      .groupBy(window($"ts", "5 minutes"))
      .agg(count(lit(1)).as("n"), sum($"value").as("v"))
      .select(unix_timestamp($"window.start").as("ws"), $"n", $"v")

    val q = agg.writeStream.format("memory").queryName("win_out")
      .outputMode("append").start()
    try {
      input.addData((ts(1), 1.0), (ts(2), 2.0)) // window [10:00,10:05)
      q.processAllAvailable()
      assert(spark.table("win_out").count() == 0) // not closed yet

      input.addData((ts(6), 10.0)) // advances watermark to 10:04 — still open
      q.processAllAvailable()
      input.addData((ts(3), 4.0))  // late, within watermark: must count
      q.processAllAvailable()
      assert(spark.table("win_out").count() == 0)

      input.addData((ts(20), 0.0)) // watermark 10:18 → both windows close
      q.processAllAvailable()
      input.addData((ts(21), 0.0)) // one more batch to flush state
      q.processAllAvailable()

      val rows = spark.table("win_out").orderBy("ws").collect()
      assert(rows.length == 2, rows.toSeq)
      assert(rows(0).getLong(1) == 3L && rows(0).getDouble(2) == 7.0) // 1+2+late 4
      assert(rows(1).getLong(1) == 1L && rows(1).getDouble(2) == 10.0)
    } finally q.stop()
  }
}
