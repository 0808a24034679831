package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.operators.Sketch

/** Streaming surfaces for the sketch family (HLL / CMS / quantile).
  *
  * The load-bearing property: every sketch here is a groupBy over a
  * BOUNDED key domain (256 HLL registers, d·w CMS counters,
  * ≤64·2^5 quantile buckets per group) whose per-key state is a
  * single max or sum — so the streaming rendering is just the same
  * aggregation running as a stateful streaming agg. State size is
  * independent of stream length (the whole point of a sketch), the
  * merge function (max / sum) is what Spark's incremental agg
  * already applies per micro-batch, and the result after processing
  * a stream equals the batch sketch of the same rows bit-for-bit —
  * StreamSketchSpec asserts it via AvailableNow + complete mode.
  *
  * Contrast with a t-digest stream: merge-order-dependent state
  * would make the streamed sketch differ run-to-run; these are
  * order-free (max/sum over pure value functions), so batch ≡
  * streaming is a theorem, not a hope.
  */
object StreamSketch {

  /** Streaming HLL register state: groupCols ++ (bucket, mj).
    * Works under update/complete output modes; finish with
    * [[hllFinish]] on the (tiny) collected state, or keep the
    * registers as the live mergeable summary.
    */
  def hllRegisters(stream: DataFrame, groupCols: Seq[String],
      key: String): DataFrame = {
    val m = 256
    val h = Sketch.hash60(col(key))
    stream
      .select(groupCols.map(col) :+ h.bitwiseAND(m - 1).as("bucket")
        :+ Sketch.hllRank(shiftright(h, 8)).as("rnk"): _*)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max("rnk").as("mj"))
  }

  /** Batch finish over a register table (from streaming state or a
    * shard merge): identical estimate arithmetic to
    * [[Sketch.hllEstimate]].
    */
  def hllFinish(registers: DataFrame, groupCols: Seq[String]): DataFrame =
    Sketch.hllFinish(registers, groupCols)

  /** Streaming Count-Min counters: (i, bucket, c) over the fixed d·w
    * domain. Point estimates via [[Sketch.cmsEstimate]] on the state.
    */
  def cmsCounters(stream: DataFrame, key: String,
      d: Int = Sketch.CmsD, w: Int = Sketch.CmsW): DataFrame =
    stream
      .select(posexplode(array((0 until d).map(i =>
        Sketch.cmsBucket(col(key), i, w)): _*)).as(Seq("i", "bucket")))
      .groupBy("i", "bucket").agg(count(lit(1)).as("c"))

  /** Streaming quantile-sketch state: groupCols ++ (e, sub, cnt).
    * Complete/update-mode counts over the bounded bucket domain;
    * estimates come from [[Sketch.quantileEstimates]] on the state.
    */
  def quantileBuckets(stream: DataFrame, groupCols: Seq[String],
      value: Column): DataFrame =
    stream
      .select(groupCols.map(col) :+ value.cast("long").as("v"): _*)
      .withColumn("e", length(bin(col("v"))).cast("int"))
      .withColumn("sub", expr(s"shiftright(v, greatest(e - ${Sketch.QSubBits}, 0))"))
      .groupBy((groupCols :+ "e" :+ "sub").map(col): _*)
      .agg(count(lit(1)).as("cnt"))
}
