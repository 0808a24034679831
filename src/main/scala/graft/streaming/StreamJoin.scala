package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream joins — the attribution shape (join each
  * right-side event to the left-side event of the same key that
  * happened within a bounded interval before it).
  *
  * Unlike a static join, a stream-stream join must buffer both sides
  * in the state store; UNBOUNDED state is the scale killer. Both
  * watermarks plus the time-range predicate make eviction provable:
  * a left row older than (right watermark − maxLag) can never match
  * again and is dropped, so state size is bounded by event-rate ×
  * (watermark + maxLag) per key shard regardless of total stream
  * volume — the property that keeps a 1000-executor streaming job at
  * a constant memory footprint. State shards across executors on the
  * equi-join key like any keyed stateful operator.
  */
object StreamJoin {

  /** Interval join: rows pair when `keyExpr` matches and
    * `leftTs <= rightTs <= leftTs + maxLag`. `joinType` "inner" emits
    * matches as they arrive; "left_outer" additionally emits
    * null-padded left rows once the watermark proves no match can
    * arrive — the funnel-drop-off / unattributed-impression signal.
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      leftTs: String,
      rightTs: String,
      leftWatermark: String,
      rightWatermark: String,
      keyExpr: String,
      maxLag: String,
      joinType: String = "inner"): DataFrame =
    left.withWatermark(leftTs, leftWatermark)
      .join(
        right.withWatermark(rightTs, rightWatermark),
        expr(s"""$keyExpr AND $rightTs >= $leftTs
                 AND $rightTs <= $leftTs + interval $maxLag"""),
        joinType)
}
