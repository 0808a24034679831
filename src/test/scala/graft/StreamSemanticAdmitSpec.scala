package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamSemanticAdmit
import graft.streaming.StreamSemanticAdmit.{AdmitOut, VecIn}

/** Streaming semantic admission over RocksDB state, driven as three
  * drained runs on one checkpoint: exemplar state survives
  * restarts, near-dup arrivals are rejected against admission-order
  * exemplars, the per-bucket exemplar cap admits-without-storing, and
  * buckets isolate state.
  */
class StreamSemanticAdmitSpec extends SparkSpec {
  import spark.implicits._

  test("admits novel vectors, rejects near-dups across batches, " +
      "cap admits without storing, buckets isolate") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ckpt = tmpDir("sadmit-ckpt")
    val outDir = tmpDir("sadmit-out")
    implicit val sqlCtx = spark.sqlContext

    try {
      val input = MemoryStream[VecIn]
      def drain(): Unit = {
        val q = StreamSemanticAdmit.admit(input.toDS(), minCosine = 0.95,
            maxExemplars = 2, ttl = java.time.Duration.ofHours(1))
          .writeStream
          .format("parquet")
          .option("path", outDir)
          .option("checkpointLocation", ckpt)
          .outputMode("append")
          .start()
        drainTws(q)
      }
      // fed OUT of vec_id order: processing must sort (1 admits first,
      // then 2 rejects against it, then 3 admits on a 0-cosine)
      input.addData(
        VecIn(7L, 2L, Array(0.99, 0.14)),
        VecIn(7L, 1L, Array(1.0, 0.0)),
        VecIn(7L, 3L, Array(0.0, 1.0)),
        VecIn(9L, 10L, Array(1.0, 0.0))) // other bucket: isolated state
      drain()
      // second run, same checkpoint: exemplars {1, 3} must persist;
      // 4 is a near-dup of 1; 5 is novel but the bucket is AT CAP so
      // it admits WITHOUT being stored
      input.addData(
        VecIn(7L, 4L, Array(0.98, 0.2)),
        VecIn(7L, 5L, Array(-1.0, 0.0)))
      drain()
      // third run: 6 is a near-dup of the UNSTORED 5 — it must admit,
      // proving 5 never entered the exemplar set
      input.addData(VecIn(7L, 6L, Array(-0.999, -0.01)))
      drain()

      val rows = spark.read.parquet(outDir).as[AdmitOut]
        .collect().sortBy(r => (r.bucket, r.vec_id))
      val flags = rows.map(r => (r.bucket, r.vec_id, r.admitted, r.matched_id))
      assert(flags.toSeq == Seq(
        (7L, 1L, true, -1L),
        (7L, 2L, false, 1L),
        (7L, 3L, true, -1L),
        (7L, 4L, false, 1L),
        (7L, 5L, true, -1L),
        (7L, 6L, true, -1L),
        (9L, 10L, true, -1L)))
      val byId = rows.map(r => r.vec_id -> r.cos).toMap
      assert(math.abs(byId(2L) - 0.990148) < 1e-5, byId(2L).toString)
      assert(math.abs(byId(4L) - 0.979804) < 1e-5, byId(4L).toString)
      assert(byId(1L) == 0.0 && byId(10L) == 0.0) // empty-bucket margin
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
