package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamDedup
import graft.streaming.StreamDedup.DocIn

/** transformWithState first-seen dedup on the RocksDB state store
  * (the API's required provider), driven as two drained runs
  * over one checkpoint — which also proves the fingerprint state
  * survives across restarts. Drain = SparkSpec.drainTws (poll
  * lastProgress until three consecutive zero-input batches) then
  * stop; processAllAvailable is deliberately NOT used — for TWS
  * ProcessingTime queries it can hang on the non-data micro-batches
  * RocksDB churns (see the drainTws doc and StreamBottomK's
  * drain-contract note). Trigger.AvailableNow is also out — with
  * MemoryStream it never concludes the snapshot in Spark 4.1 and
  * each drain burned a full await timeout (r10 test-time audit:
  * this suite alone read 4m08s, now seconds).
  */
class StreamDedupSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int) =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("first occurrence survives; dups report the surviving doc and count") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ckpt = tmpDir("sdedup-ckpt")
    val outDir = tmpDir("sdedup-out")
    implicit val sqlCtx = spark.sqlContext

    try {
      val input = MemoryStream[DocIn]
      def drain(): Unit = {
        // parquet sink: supports exactly-once checkpoint recovery, so
        // the second run restores the fingerprint state (memory sink
        // refuses to recover)
        val q = StreamDedup.firstSeen(input.toDS(), java.time.Duration.ofHours(1))
          .writeStream
          .format("parquet")
          .option("path", outDir)
          .option("checkpointLocation", ckpt)
          .outputMode("append")
          .start()
        drainTws(q)
      }
      input.addData(DocIn(100L, 1L, ts(0)), DocIn(200L, 2L, ts(1)))
      drain()
      // same fingerprints again (second run, same checkpoint) + fresh one
      input.addData(
        DocIn(100L, 3L, ts(2)), DocIn(100L, 4L, ts(3)), DocIn(300L, 5L, ts(4)))
      drain()

      val rows = spark.read.parquet(outDir)
        .orderBy("fingerprint", "nSeen").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2),
          r.getLong(3), r.getLong(4))).toSeq
      assert(rows == Seq(
        (100L, 1L, true, 1L, 1L),
        (100L, 3L, false, 1L, 2L),
        (100L, 4L, false, 1L, 3L),
        (200L, 2L, true, 2L, 1L),
        (300L, 5L, true, 5L, 1L)))
    } finally {
      prev match {
        case Some(p) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
