package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Stats

/** Streaming Holt linear-trend forecast: the period-bucket sums of
  * [[graft.operators.Stats.holtLinearSummary]] maintained as a
  * stateful streaming aggregation, finished to the level/trend/skill
  * summary per micro-batch — a live 1-step-ahead forecaster whose
  * trend term updates as revenue (or volume) streams in, the
  * forecasting sibling of StreamTrend (OLS slope) and StreamEwma.
  *
  * Why this is safe to stream (the house argument): the Holt
  * recursion itself is order-DEPENDENT — it cannot be a streaming
  * fold. What streams is the step BEFORE it: state is one (bucket,
  * Σx) row per period — exact integer sums, order-free merges — so
  * the incremental agg maintains exactly the batch series regardless
  * of micro-batch boundaries and late arrivals within the retained
  * horizon. The finish then re-folds the periods-sized series with
  * the SHARED batch arithmetic each trigger: O(periods) driver-side
  * work per emit, priced by the series length, not the stream volume.
  * State is O(periods); for unbounded horizons apply the watermark/
  * TTL-at-horizon contract documented on StreamSurvival. Batch ≡
  * streaming is therefore a theorem, and StreamHoltSpec proves the
  * drained state finishes bit-identical to the batch operator.
  */
object StreamHolt {

  /** Streaming per-period sum state: (t, x); update/complete modes. */
  def bucketSums(stream: DataFrame, bucket: Column,
      value: Column): DataFrame =
    stream.groupBy(bucket.as("t")).agg(sum(value).as("x"))

  /** Finish drained state to the Holt summary — identical output to
    * the batch `Stats.holtLinearSummary` on the same rows.
    */
  def holtFrom(state: DataFrame): DataFrame =
    Stats.holtLinearSummary(state, "t", "x")
}
