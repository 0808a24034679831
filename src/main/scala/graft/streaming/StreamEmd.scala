package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.operators.Drift

/** Streaming earth-mover drift monitor: the EMD current-side bin
  * counters as a stateful streaming aggregation against a FIXED
  * reference histogram — the StreamDrift sibling for the metric that
  * sees HOW FAR mass moved (StreamDrift's PSI only sees that bin
  * shares changed; a slow ramp that walks mass across bins registers
  * on EMD long before any single bin's ratio alarms).
  *
  * Why this is safe to stream (the StreamDrift argument verbatim):
  * state is `groupBy(bin).count()` over ≤ nBins fixed-width keys,
  * count is an order-free merge, so micro-batch boundaries cannot
  * change the counts; the finish ([[Drift.emdFromSides]] →
  * emdFromCounts) is shared arithmetic with the batch monitor, so
  * drained state finishes BIT-EXACT to the batch EMD of the same
  * rows — StreamEmdSpec proves it. And because the finish is exact
  * integer arithmetic end to end (unlike PSI's ln), the streamed
  * alert value itself is deterministic, not merely close.
  */
object StreamEmd {

  /** Streaming current-slice bin counters (bin, n_cur); update /
    * complete output modes.
    */
  def binCounters(stream: DataFrame, valueCol: String, lo: Double,
      hi: Double, nBins: Int): DataFrame =
    Drift.binCounts(stream, valueCol, lo, hi, nBins, "n_cur")

  /** Finish the streamed state against a reference histogram built
    * with `Drift.binCounts(ref, ..., "n_ref")` — identical output to
    * the batch EMD on the same rows.
    */
  def emdAgainst(refCounts: DataFrame, curState: DataFrame): DataFrame =
    Drift.emdFromSides(refCounts, curState)
}
