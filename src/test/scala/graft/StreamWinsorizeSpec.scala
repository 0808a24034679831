package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Sketch
import graft.streaming.StreamWinsorize
import graft.streaming.StreamWinsorize.EventIn

/** Streaming online winsorize: bounded MapState sketch, bounds
  * bit-equal to the batch sketch estimates over the same prefix,
  * state survives a restart, and the bucket state never exceeds its
  * fixed ceiling.
  */
class StreamWinsorizeSpec extends SparkSpec {
  import spark.implicits._

  private def withRocks(f: => Unit): Unit = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try f finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }

  test("bucketKey/bucketMid mirror the batch sketch arithmetic exactly") {
    val vals = Seq(0L, 1L, 2L, 63L, 64L, 65L, 1000L, 123456L, 999999999L,
      (1L << 45) + 12345L)
    val df = vals.toDF("v")
    val batch = Sketch.quantileSketch(df, Seq.empty, col("v"))
      .collect().map(r => (r.getInt(0).toLong * 64 + r.getLong(1), r.getLong(2)))
      .toMap
    val mine = vals.groupBy(StreamWinsorize.bucketKey)
      .map { case (k, vs) => k -> vs.size.toLong }
    assert(mine == batch, s"$mine vs $batch")
  }

  test("two drained runs: bounds tighten with accumulated state, " +
      "equal the batch sketch estimates over each prefix, state bounded") {
    withRocks {
      val ckpt = tmpDir("swins-ckpt")
      val outDir = tmpDir("swins-out")
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[EventIn]
      def drain(): Unit = {
        val q = StreamWinsorize.clamp(input.toDS())
          .writeStream.format("parquet")
          .option("path", outDir)
          .option("checkpointLocation", ckpt)
          .outputMode("append")
          .start()
        drainTws(q)
      }
      // batch 1: 100 calm values 1000..1099 cents + one spike
      val b1 = (0 until 100).map(i =>
        EventIn("g", i.toLong, 1000L + i)) :+ EventIn("g", 900L, 500000L)
      // batch 2: 100 more calm + one negative-side outlier (clamped up)
      val b2 = (100 until 200).map(i =>
        EventIn("g", i.toLong, 1000L + i)) :+ EventIn("g", 901L, 1L)
      input.addData(b1: _*); drain()
      input.addData(b2: _*); drain()

      val out = spark.read.parquet(outDir)
        .collect().map(r => r.getLong(1) ->
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap

      // reference bounds per prefix from the BATCH sketch machinery
      def refBounds(rows: Seq[EventIn]): (Long, Long) = {
        val sk = Sketch.quantileSketch(
          rows.toDF("event_type", "event_id", "cents"),
          Seq("event_type"), col("cents"))
        val est = Sketch.quantileEstimates(sk, Seq("event_type"),
          Seq(("lo", 1, 20), ("hi", 19, 20)))
          .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
        (est("lo"), est("hi"))
      }
      val (lo1, hi1) = refBounds(b1)
      val (lo2, hi2) = refBounds(b1 ++ b2)
      // every batch-1 row carries prefix-1 bounds, batch-2 rows prefix-2
      b1.foreach(e => assert(out(e.event_id)._3 == lo1
        && out(e.event_id)._4 == hi1, s"b1 bounds for ${e.event_id}"))
      b2.foreach(e => assert(out(e.event_id)._3 == lo2
        && out(e.event_id)._4 == hi2, s"b2 bounds for ${e.event_id}"))
      // clamping: the spike clamped down to hi1, the tiny value up to lo2
      assert(out(900L)._2 == hi1 && out(900L)._1 == 500000L)
      assert(out(901L)._2 == lo2 && out(901L)._1 == 1L)
      // calm rows inside the band pass through untouched
      assert(out(50L)._1 == out(50L)._2)
      // bounded state: distinct buckets across ALL values stays tiny
      val nBuckets = (b1 ++ b2).map(e => StreamWinsorize.bucketKey(e.cents))
        .toSet.size
      assert(nBuckets <= 64 * (1 << (Sketch.QSubBits - 1)))
    }
  }

  test("preBatchBounds variant: first batch passes with sentinel " +
      "bounds, batch 2 clamps with state-as-of-batch-start (= the " +
      "default variant's prefix-1 bounds), rows never buffer") {
    withRocks {
      val ckpt = tmpDir("swinspre-ckpt")
      val outDir = tmpDir("swinspre-out")
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[EventIn]
      def drain(): Unit = {
        val q = StreamWinsorize.clamp(input.toDS(), preBatchBounds = true)
          .writeStream.format("parquet")
          .option("path", outDir)
          .option("checkpointLocation", ckpt)
          .outputMode("append")
          .start()
        drainTws(q)
      }
      val b1 = (0 until 100).map(i =>
        EventIn("g", i.toLong, 1000L + i)) :+ EventIn("g", 900L, 500000L)
      val b2 = (100 until 200).map(i =>
        EventIn("g", i.toLong, 1000L + i)) :+ EventIn("g", 901L, 1L)
      input.addData(b1: _*); drain()
      input.addData(b2: _*); drain()

      val out = spark.read.parquet(outDir)
        .collect().map(r => r.getLong(1) ->
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap

      // batch 1: no prior state → sentinel bounds, nothing clamped
      b1.foreach { e =>
        val (c, w, lo, hi) = out(e.event_id)
        assert(lo == Long.MinValue && hi == Long.MaxValue,
          s"b1 sentinel bounds for ${e.event_id}")
        assert(w == c, s"b1 row ${e.event_id} must pass unclamped")
      }
      // batch 2's bounds are the state AS OF batch start — exactly the
      // default variant's prefix-1 bounds from the batch sketch
      val sk = Sketch.quantileSketch(
        b1.toDF("event_type", "event_id", "cents"),
        Seq("event_type"), col("cents"))
      val est = Sketch.quantileEstimates(sk, Seq("event_type"),
        Seq(("lo", 1, 20), ("hi", 19, 20)))
        .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
      val (lo1, hi1) = (est("lo"), est("hi"))
      b2.foreach { e =>
        val (_, _, lo, hi) = out(e.event_id)
        assert(lo == lo1 && hi == hi1, s"b2 bounds for ${e.event_id}")
      }
      // the batch-2 outlier clamps against the PRIOR distribution
      assert(out(901L)._2 == lo1 && out(901L)._1 == 1L)
    }
  }
}
