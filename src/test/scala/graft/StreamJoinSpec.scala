package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamJoin

/** Stream-stream interval (attribution) join: clicks attach to the
  * impression of the same user within 10 minutes BEFORE the click;
  * the left_outer variant emits unattributed impressions only after
  * the watermark proves no click can still arrive — the state-bounded
  * behavior that keeps the join constant-memory at scale.
  */
class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int, s: Int = 0) =
    Timestamp.valueOf(f"2024-01-01 10:$m%02d:$s%02d")

  test("inner interval join pairs in-window clicks only") {
    implicit val ctx = spark.sqlContext
    val imps = MemoryStream[(Long, Timestamp)]
    val clicks = MemoryStream[(Long, Timestamp)]
    val joined = StreamJoin.intervalJoin(
      imps.toDF().toDF("user", "imp_ts"),
      clicks.toDF().toDF("cuser", "click_ts"),
      "imp_ts", "click_ts", "5 minutes", "5 minutes",
      "user = cuser", "10 minutes")
      .select($"user", unix_timestamp($"imp_ts").as("i"),
        unix_timestamp($"click_ts").as("c"))

    val q = joined.writeStream.format("memory").queryName("ssj_inner")
      .outputMode("append").start()
    try {
      imps.addData((1L, ts(0)), (2L, ts(0)), (3L, ts(0)))
      clicks.addData(
        (1L, ts(4)),   // in window → pairs
        (2L, ts(15)),  // 15 min after impression → outside maxLag
        (3L, ts(0, 1)) // 1 s after → pairs
      )
      q.processAllAvailable()
      val got = spark.table("ssj_inner").collect()
        .map(r => (r.getLong(0), r.getLong(2) - r.getLong(1))).toSet
      assert(got == Set((1L, 240L), (3L, 1L)))
    } finally q.stop()
  }

  test("stream-static enrichment: each micro-batch joins the static " +
      "dim (stateless — no watermark, no state store)") {
    implicit val ctx = spark.sqlContext
    val dim = Seq((1L, "bronze"), (2L, "gold")).toDF("user", "tier")
    val clicks = MemoryStream[(Long, Timestamp)]
    val joined = clicks.toDF().toDF("user", "ts")
      .join(org.apache.spark.sql.functions.broadcast(dim), Seq("user"),
        "left")
      .select($"user", $"tier")
    val q = joined.writeStream.format("memory").queryName("ss_enrich")
      .outputMode("append").start()
    try {
      clicks.addData((1L, ts(0)), (2L, ts(1)), (9L, ts(2)))
      q.processAllAvailable()
      clicks.addData((2L, ts(3)))
      q.processAllAvailable()
      val got = spark.table("ss_enrich").collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getString(1))))
      assert(got.count(_ == ((2L, Some("gold")))) == 2) // both batches
      assert(got.contains((1L, Some("bronze"))))
      assert(got.contains((9L, None))) // unknown user passes through
    } finally q.stop()
  }

  test("left_outer emits the unattributed impression once the " +
      "watermark proves no click can arrive") {
    implicit val ctx = spark.sqlContext
    val imps = MemoryStream[(Long, Timestamp)]
    val clicks = MemoryStream[(Long, Timestamp)]
    val joined = StreamJoin.intervalJoin(
      imps.toDF().toDF("user", "imp_ts"),
      clicks.toDF().toDF("cuser", "click_ts"),
      "imp_ts", "click_ts", "2 minutes", "2 minutes",
      "user = cuser", "10 minutes", joinType = "left_outer")
      .select($"user", $"cuser")

    val q = joined.writeStream.format("memory").queryName("ssj_outer")
      .outputMode("append").start()
    try {
      imps.addData((1L, ts(0)), (2L, ts(0)))
      clicks.addData((1L, ts(3)))
      q.processAllAvailable()
      // user 2 unmatched but provably-dead only after both watermarks
      // pass imp_ts + maxLag: advance both streams well beyond
      imps.addData((9L, ts(30)))
      clicks.addData((9L, ts(59)))
      q.processAllAvailable()
      imps.addData((8L, ts(59)))
      clicks.addData((8L, ts(59, 30)))
      q.processAllAvailable()
      val byUser = spark.table("ssj_outer").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .toMap
      assert(byUser(1L) == Some(1L))     // attributed
      assert(byUser.get(2L) == Some(None)) // emitted null-padded
    } finally q.stop()
  }
}
