package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Scd2
import graft.streaming.StreamScd2

/** Streaming SCD2 maintenance vs its batch face: after draining N
  * micro-batches the maintained dimension equals the full
  * `fromChangeLog` rebuild over every row, the version pointer
  * advances per batch, and replaying an already-applied batch is a
  * no-op (collapse idempotency).
  */
object StreamScd2Spec {
  case class Change(k: Long, ts: Timestamp, eid: Long, v: String)
}

class StreamScd2Spec extends SparkSpec {
  import spark.implicits._
  import StreamScd2Spec.Change

  private def ts(s: String) = Timestamp.valueOf(s)

  private val allRows = Seq(
    Change(1L, ts("2024-01-01 00:00:00"), 10L, "a"),
    Change(1L, ts("2024-01-02 00:00:00"), 11L, "a"), // collapses
    Change(2L, ts("2024-01-02 12:00:00"), 20L, "x"),
    // batch 2
    Change(1L, ts("2024-01-03 00:00:00"), 12L, "b"),
    Change(3L, ts("2024-01-03 06:00:00"), 30L, "q"),
    // batch 3
    Change(1L, ts("2024-01-05 00:00:00"), 14L, "a"),
    Change(2L, ts("2024-01-06 00:00:00"), 21L, "y"))

  private def canon(df: DataFrame): Set[(Long, Long, String, Option[Long],
      Option[Long], Boolean)] =
    df.select(col("k"), col("eid"), col("v"),
        (col("valid_from").cast("timestamp").cast("double") * 1000000L)
          .cast("long").as("vf"),
        (col("valid_to").cast("timestamp").cast("double") * 1000000L)
          .cast("long").as("vt"),
        col("is_current"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        r.getBoolean(5)))
      .toSet

  test("drained micro-batches == full batch rebuild; pointer advances; " +
      "replaying an applied batch is a no-op") {
    val dimDir = tmpDir("sscd2-dim")
    val ckpt = tmpDir("sscd2-ckpt")
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Change]

    def drain(): Unit = {
      val q = StreamScd2.sink(input.toDF(), dimDir, ckpt,
        "k", "ts", "eid", "v").start()
      drainTws(q)
    }

    input.addData(allRows.take(3): _*)
    drain()
    val v1 = StreamScd2.currentVersion(dimDir)
    assert(v1.isDefined)
    assert(canon(StreamScd2.readDim(spark, dimDir).get) ==
      canon(Scd2.fromChangeLog(allRows.take(3).toDF("k", "ts", "eid", "v"),
        "k", "ts", "eid", "v")))

    input.addData(allRows.slice(3, 5): _*)
    drain()
    input.addData(allRows.drop(5): _*)
    drain()
    val vLast = StreamScd2.currentVersion(dimDir)
    assert(vLast != v1, "pointer must advance across batches")
    val full = canon(Scd2.fromChangeLog(
      allRows.toDF("k", "ts", "eid", "v"), "k", "ts", "eid", "v"))
    assert(canon(StreamScd2.readDim(spark, dimDir).get) == full)

    // replay safety: merging an already-applied batch changes nothing
    // (exact-duplicate change rows collapse)
    val replayed = Scd2.merge(StreamScd2.readDim(spark, dimDir).get,
      allRows.drop(5).toDF("k", "ts", "eid", "v"), "k", "ts", "eid", "v")
    assert(canon(replayed) == full)
  }
}
