package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.operators.Sketch
import graft.streaming.StreamSketch

/** Sketch state is a bounded-domain groupBy with an order-free merge
  * (max / sum), so the streaming rendering is the SAME aggregation as
  * a stateful streaming agg — and its final state must equal the
  * batch sketch of the same rows bit-for-bit, estimates included.
  */
class StreamSketchSpec extends SparkSpec {

  private def stage(name: String) = {
    val li = Tables.lineitem(spark, Sf0001)
      .select("l_returnflag", "l_partkey", "l_extendedprice")
    val dir = tmpDir(name)
    li.write.mode("overwrite").parquet(dir + "/in")
    (li, dir)
  }

  test("streaming HLL registers == batch registers; same estimate") {
    val (li, dir) = stage("stream_hll")

    val sink = s"hll_state_${System.nanoTime()}"
    val q = StreamSketch.hllRegisters(
        spark.readStream.schema(li.schema).parquet(dir + "/in"),
        Seq("l_returnflag"), "l_partkey")
      .writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", dir + "/ckpt")
      .start()
    q.awaitTermination(120000)

    val streamedEst = Sketch.hllFinish(spark.table(sink), Seq("l_returnflag"))
      .collect().map(_.toSeq).toSet
    val batchEst = Sketch.hllEstimate(li, Seq("l_returnflag"), "l_partkey")
      .collect().map(_.toSeq).toSet
    assert(streamedEst == batchEst)
    assert(streamedEst.nonEmpty)
  }

  test("streaming CMS counters == batch sketch; same point estimates") {
    val (li, dir) = stage("stream_cms")

    val sink = s"cms_state_${System.nanoTime()}"
    val q = StreamSketch.cmsCounters(
        spark.readStream.schema(li.schema).parquet(dir + "/in"), "l_partkey")
      .writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", dir + "/ckpt")
      .start()
    q.awaitTermination(120000)

    val targets = li.select("l_partkey").filter(col("l_partkey") <= 40).distinct()
    val streamedEst = Sketch.cmsEstimate(spark.table(sink), targets, "l_partkey")
      .collect().map(_.toSeq).toSet
    val batchEst = Sketch.cmsEstimate(
        Sketch.cmsSketch(li, "l_partkey"), targets, "l_partkey")
      .collect().map(_.toSeq).toSet
    assert(streamedEst == batchEst)
    assert(streamedEst.nonEmpty)
  }

  test("streaming quantile buckets == batch sketch; same estimates") {
    val (li, dir) = stage("stream_qsketch")
    val cents = (col("l_extendedprice").cast("decimal(12,2)") * 100)
    val qs = Seq(("p50", 1, 2), ("p95", 19, 20))

    val sink = s"qsk_state_${System.nanoTime()}"
    val q = StreamSketch.quantileBuckets(
        spark.readStream.schema(li.schema).parquet(dir + "/in"),
        Seq("l_returnflag"), cents)
      .writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", dir + "/ckpt")
      .start()
    q.awaitTermination(120000)

    val state = spark.table(sink)
    val batchSk = Sketch.quantileSketch(li, Seq("l_returnflag"), cents)
    assert(state.collect().map(_.toSeq).toSet ==
      batchSk.collect().map(_.toSeq).toSet)
    assert(
      Sketch.quantileEstimates(state, Seq("l_returnflag"), qs)
        .collect().map(_.toSeq).toSet ==
        Sketch.quantileEstimates(batchSk, Seq("l_returnflag"), qs)
          .collect().map(_.toSeq).toSet)
  }
}
