package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamConcatCut
import graft.streaming.StreamConcatCut.DocIn

/** Streaming concat-and-cut vs its batch face: a single-shard
  * drained run equals Packing.concatCut span-for-span; a second
  * batch extends each shard's stream as a pure suffix (earlier spans
  * immutable), landing exactly where the batch layout over the union
  * puts it; per-shard offsets are independent.
  */
class StreamConcatCutSpec extends SparkSpec {
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

  test("one single-shard pass == batch concatCut; a later batch is a " +
      "pure suffix equal to the batch layout over the union") {
    withRocksDb {
      val ckpt = tmpDir("sccut-ckpt")
      val outDir = tmpDir("sccut-out")
      implicit val sqlCtx = spark.sqlContext

      val batch1 = (0L until 37L).map(i => DocIn(0, i, 5L + i % 90))
      val batch2 = (37L until 60L).map(i => DocIn(0, i, 3L + i % 50))
      val input = MemoryStream[DocIn]
      def drain(): Unit = {
        val q = StreamConcatCut.layout(input.toDS(), seqLen = 64L)
          .writeStream
          .format("parquet")
          .option("path", outDir)
          .option("checkpointLocation", ckpt)
          .outputMode("append")
          .start()
        drainTws(q)
      }
      def spans(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, Long, Long, Long)] =
        df.select("doc_id", "start_tok", "end_tok", "first_seq", "last_seq")
          .collect()
          .map(r => r.getLong(0) ->
            ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      def batchRef(docs: Seq[DocIn]): Map[Long, (Long, Long, Long, Long)] =
        spans(graft.operators.Packing.concatCut(
          docs.toDF("shard", "doc_id", "n_toks"), "doc_id", "n_toks",
          seqLen = 64L)
          .withColumn("first_seq", expr("start_tok div 64"))
          .withColumn("last_seq", expr("end_tok div 64"))
          .select("doc_id", "start_tok", "end_tok", "first_seq", "last_seq")
          .distinct())

      input.addData(batch1: _*)
      drain()
      val afterOne = spans(spark.read.parquet(outDir))
      assert(afterOne == batchRef(batch1))

      input.addData(batch2: _*)
      drain()
      val afterTwo = spans(spark.read.parquet(outDir))
      // earlier spans byte-identical (never re-emitted/moved), and the
      // whole layout equals batch concatCut over the union
      afterOne.foreach { case (id, sp) => assert(afterTwo(id) == sp) }
      assert(afterTwo == batchRef(batch1 ++ batch2))
    }
  }

  test("shards lay out independently: each starts at 0 and never " +
      "sees another shard's offset") {
    withRocksDb {
      val ckpt = tmpDir("sccut2-ckpt")
      val outDir = tmpDir("sccut2-out")
      implicit val sqlCtx = spark.sqlContext
      val docs = (0L until 30L).map(i => DocIn((i % 3).toInt, i, 10L))
      val input = MemoryStream[DocIn]
      input.addData(docs: _*)
      val q = StreamConcatCut.layout(input.toDS(), seqLen = 16L)
        .writeStream
        .format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
      drainTws(q)
      val got = spark.read.parquet(outDir)
        .select("shard", "start_tok", "end_tok").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
        .groupBy(_._1)
      assert(got.keySet == Set(0, 1, 2))
      got.foreach { case (_, ss) =>
        val sorted = ss.sortBy(_._2)
        assert(sorted.head._2 == 0L) // each shard's stream starts at 0
        sorted.sliding(2).foreach {
          case Array((_, _, e), (_, s2, _)) => assert(e + 1 == s2)
          case _ =>
        }
        // 10 docs × 11 tokens (incl. EOS) per shard
        assert(sorted.last._3 == 10 * 11 - 1)
      }
    }
  }
}
