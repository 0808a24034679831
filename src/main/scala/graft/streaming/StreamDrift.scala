package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.operators.Drift

/** Streaming input-drift monitor: the PSI current-side bin counters
  * running as a stateful streaming aggregation against a FIXED
  * reference histogram (yesterday's corpus, the training snapshot).
  *
  * Why this is safe to stream (the StreamSketch argument): the
  * current-side state is `groupBy(bin).count()` over a BOUNDED key
  * domain (≤ nBins keys — fixed-width bins, no percentile
  * estimation), and count is an order-free merge, so Spark's
  * incremental streaming agg maintains exactly the batch counts
  * regardless of micro-batch boundaries. State size is O(nBins),
  * independent of stream length. The PSI finish ([[Drift
  * .psiFromCounts]]) is shared arithmetic with the batch monitor,
  * so the streamed state finishes to the BIT-EXACT batch PSI of the
  * same rows — StreamDriftSpec proves batch ≡ streaming, the house
  * requirement for every streaming operator.
  *
  * Deployment shape at 100 TB/day: run [[binCounters]] with
  * update/complete mode into a tiny state store; alert when the
  * finished `psi_total` of the live window crosses 0.25 (the
  * industry action threshold — see Drift's band doc).
  */
object StreamDrift {

  /** Streaming current-slice bin counters (bin, n_cur). Works under
    * update/complete output modes; windowed variants compose by
    * adding the window to the groupBy upstream.
    */
  def binCounters(stream: DataFrame, valueCol: String, lo: Double,
      hi: Double, nBins: Int): DataFrame =
    Drift.binCounts(stream, valueCol, lo, hi, nBins, "n_cur")

  /** Finish the streamed state against a reference histogram built
    * with `Drift.binCounts(ref, ..., "n_ref")`. Identical output to
    * the batch `Drift.psiNumeric` on the same rows.
    */
  def psiAgainst(refCounts: DataFrame, curState: DataFrame,
      nBins: Int): DataFrame =
    Drift.psiFromCounts(refCounts, curState, nBins)
}
