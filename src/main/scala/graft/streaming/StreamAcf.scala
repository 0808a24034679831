package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}

import graft.operators.Stats

/** Streaming per-group autocorrelation: the SAME (g, b, v) bucket-sum
  * state as [[StreamEwma]] (one exact integer sum per group×bucket,
  * order-free merges — late rows fold into their own bucket), drained
  * per micro-batch and finished through the batch ACF arithmetic
  * ([[graft.operators.Stats.acfFromSums]]) — the live "has this
  * metric's memory structure changed" read that re-validates the
  * seasonal-naive lag choice as data streams in. Batch ≡ streaming
  * bit-exact by shared finish; StreamAcfSpec proves it. State bound:
  * O(groups × buckets in the retention horizon) — identical contract
  * to StreamEwma (the two finishes can share ONE state store).
  */
object StreamAcf {

  /** Streaming bucket-sum state (g, b, v); update/complete output
    * modes. Identical to StreamEwma.bucketSums — shared state.
    */
  def bucketSums(stream: DataFrame, group: String, bucket: Column,
      vInt: Column): DataFrame =
    Stats.bucketSums(stream, group, bucket, vInt)

  /** Finish drained state to (g, lag, n, acf) — identical output to
    * the batch `Stats.groupedAcf` on the same rows.
    */
  def acfFrom(state: DataFrame, maxLag: Int): DataFrame =
    Stats.acfFromSums(state, maxLag)
}
