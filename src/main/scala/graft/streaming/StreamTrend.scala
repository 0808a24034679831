package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}

import graft.operators.Stats

/** Streaming per-group trend: the OLS sufficient statistics of
  * [[graft.operators.Stats.groupedOlsSlope]] running as a stateful
  * streaming aggregation, finished to per-segment slopes per
  * micro-batch — live "how fast is each segment moving" without a
  * nightly batch pass, the metric-drift sibling of StreamDrift
  * (distribution) and StreamCalibration (probability).
  *
  * Why this is safe to stream (the house argument): state is one
  * (n, Σt, Σy, Σty, Σt²) row per group — count and EXACT integer/
  * decimal sums, all order-free merges, so Spark's incremental
  * streaming agg maintains exactly the batch statistics regardless
  * of micro-batch boundaries. State is O(groups); the slope finish
  * ([[Stats.olsSlopeFromStats]]) is shared arithmetic with the batch
  * operator, so the streamed state finishes to the BIT-EXACT batch
  * slope of the same rows — StreamTrendSpec proves batch ≡
  * streaming, the house requirement for every streaming operator.
  */
object StreamTrend {

  /** Streaming sufficient-statistics state (group, n, st, sy, sty,
    * stt); update/complete output modes.
    */
  def sufficientStats(stream: DataFrame, group: String, tInt: Column,
      yInt: Column): DataFrame =
    Stats.olsSufficientStats(stream, group, tInt, yInt)

  /** Finish drained state to (group, n, slope) — identical output to
    * the batch `Stats.groupedOlsSlope` on the same rows.
    */
  def slopesFrom(state: DataFrame): DataFrame =
    Stats.olsSlopeFromStats(state)
}
