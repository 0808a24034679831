package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamDomainCap
import graft.streaming.StreamDomainCap.DocIn

/** Streaming admission cap vs its batch face: one drained run
  * equals Sampling.groupCapSample exactly; across batches the cap
  * holds with one counter of state per domain and admissions are
  * prefix-greedy (never retracted).
  */
class StreamDomainCapSpec extends SparkSpec {
  import spark.implicits._

  private def withRocksDb[T](body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }

  test("one drained run == batch groupCapSample exactly; " +
      "a second batch only fills remaining room, never retracts") {
    withRocksDb {
      val ckpt = tmpDir("sdomcap-ckpt")
      val outDir = tmpDir("sdomcap-out")
      implicit val sqlCtx = spark.sqlContext

      val batch1 = (0L until 40L).map(i => DocIn(s"dom${i % 2}", i)) // 20/20
      val input = MemoryStream[DocIn]
      def drain(): Unit = {
        val q = StreamDomainCap.admit(input.toDS(), cap = 6)
          .writeStream
          .format("parquet")
          .option("path", outDir)
          .option("checkpointLocation", ckpt)
          .outputMode("append")
          .start()
        drainTws(q)
      }
      input.addData(batch1: _*)
      drain()
      val afterOne = spark.read.parquet(outDir)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      // single batch ⇒ greedy = global: exactly the batch operator
      val batchRef = graft.operators.Sampling.groupCapSample(
          batch1.toDF("host", "doc_id"), "host", "doc_id", cap = 6)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(afterOne == batchRef, s"stream $afterOne vs batch $batchRef")
      assert(afterOne.count(_._1 == "dom0") == 6
        && afterOne.count(_._1 == "dom1") == 6)

      // batch 2: dom0 is full (drops even priority-0 arrivals — the
      // documented greedy gap); a fresh domain admits up to cap
      input.addData(
        (100L until 110L).map(i => DocIn("dom0", i)) ++
          (200L until 205L).map(i => DocIn("fresh", i)): _*)
      drain()
      val afterTwo = spark.read.parquet(outDir)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(afterTwo.count(_._1 == "dom0") == 6) // unchanged, capped
      assert(afterTwo.count(_._1 == "fresh") == 5) // under cap: all in
      // batch-1 admissions all still present (append sink never
      // retracts — the semantics the operator documents)
      assert(afterOne.subsetOf(afterTwo.toSet))
    }
  }
}
