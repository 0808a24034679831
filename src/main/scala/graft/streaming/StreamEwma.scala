package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}

import graft.operators.Stats

/** Streaming per-group truncated EWMA: the (g, b, v) bucket sums of
  * [[graft.operators.Stats.groupedEwma]] maintained as a stateful
  * streaming aggregation, finished to per-bucket smoothed levels per
  * micro-batch — the live "current level" readout that StreamTrend
  * (slope) and StreamDrift (distribution) sit beside.
  *
  * Why this is safe to stream (the house argument): state is one
  * exact integer sum per (group, bucket) — order-free merges, so the
  * incremental streaming agg maintains exactly the batch bucket
  * series regardless of micro-batch boundaries, late rows included
  * (a late event folds into its own bucket, not the arrival bucket).
  * The smoothing finish ([[Stats.ewmaFromSums]]) is shared
  * arithmetic with the batch operator, so drained state finishes to
  * the BIT-EXACT batch EWMA of the same rows — StreamEwmaSpec proves
  * batch ≡ streaming, the house requirement for every streaming
  * operator.
  *
  * State bound: O(groups × buckets in the retention horizon); cap it
  * in production with a watermark on the bucket's event time (the
  * finish only ever needs the last `window` buckets per group).
  */
object StreamEwma {

  /** Streaming bucket-sum state (g, b, v); update/complete output
    * modes.
    */
  def bucketSums(stream: DataFrame, group: String, bucket: Column,
      vInt: Column): DataFrame =
    Stats.bucketSums(stream, group, bucket, vInt)

  /** Finish drained state to (g, b, v, ewma_micros) — identical
    * output to the batch `Stats.groupedEwma` on the same rows.
    */
  def ewmaFrom(state: DataFrame, window: Int, num: Int,
      den: Int): DataFrame =
    Stats.ewmaFromSums(state, window, num, den)
}
