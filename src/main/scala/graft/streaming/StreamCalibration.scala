package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}

import graft.operators.Stats

/** Streaming isotonic score calibration: the (bin, n, Σy) counters of
  * [[graft.operators.Stats.isotonicCalibrate]] running as a stateful
  * streaming aggregation, finished to the calibration table per
  * micro-batch — so a live quality-classifier's calibration map
  * tightens continuously as labeled feedback streams in, instead of
  * waiting for the nightly batch job.
  *
  * Why this is safe to stream (the StreamDrift/StreamSketch
  * argument): state is `groupBy(bin).agg(count, sum(y))` over a
  * BOUNDED key domain (≤ nBins fixed-width bins — pure integer
  * arithmetic, no percentile estimation), and count/sum are
  * order-free merges, so Spark's incremental streaming agg maintains
  * exactly the batch counts regardless of micro-batch boundaries.
  * State size is O(nBins), independent of stream length. The PAV
  * finish ([[Stats.isotonicFromCounts]]) is shared arithmetic with
  * the batch operator, so the streamed state finishes to the
  * BIT-EXACT batch calibration of the same rows — StreamCalibrationSpec
  * proves batch ≡ streaming, the house requirement for every
  * streaming operator.
  *
  * Deployment shape at 100 TB/day: [[binCounters]] in update/complete
  * mode into a tiny state store; per trigger (or on a slower cadence)
  * [[calibrationFrom]] the drained counters in foreachBatch and
  * broadcast-publish the ≤ nBins calibration table to the scoring
  * fleet. The solve itself is metadata joins (see the batch doc) —
  * running it per trigger costs bins², never a corpus scan.
  */
object StreamCalibration {

  /** Streaming (bin, n, sy) counters; update/complete output modes. */
  def binCounters(stream: DataFrame, score: Column, label: Column,
      lo: Double, hi: Double, nBins: Int): DataFrame =
    Stats.calibrationBinCounts(stream, score, label, lo, hi, nBins)

  /** Finish drained counter state to the calibration table —
    * identical output to the batch `Stats.isotonicCalibrate` on the
    * same rows.
    */
  def calibrationFrom(counters: DataFrame): DataFrame =
    Stats.isotonicFromCounts(counters)
}
