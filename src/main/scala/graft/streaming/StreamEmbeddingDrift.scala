package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}

import graft.operators.Drift

/** Streaming embedding-distribution drift: the per-dimension micros
  * sums of [[graft.operators.Drift.embeddingDrift]]'s current slice
  * maintained as a stateful streaming aggregation, finished against
  * a static reference-snapshot stats table per micro-batch — the
  * live "has the encoder / corpus mix moved" monitor guarding ANN
  * indexes and semantic-dedup thresholds at ingest time, beside
  * StreamDrift (scalar PSI) and StreamEmd (scalar CDF distance).
  *
  * Why this is safe to stream (the house argument): state is one
  * exact integer (sum, count) row per DIMENSION — order-free merges,
  * bounded at exactly `dim` rows no matter the ingest volume — so
  * the incremental agg maintains exactly the batch sufficient
  * statistics regardless of micro-batch boundaries. The drift finish
  * ([[Drift.embeddingDriftFromStats]]) is shared arithmetic with the
  * batch operator, so drained state vs the same reference finishes
  * to the BIT-EXACT batch drift of the same rows —
  * StreamEmbeddingDriftSpec proves batch ≡ streaming.
  */
object StreamEmbeddingDrift {

  /** Streaming per-dim stats state (pos, sm, n); update/complete
    * output modes.
    */
  def dimStats(stream: DataFrame, emb: Column): DataFrame =
    Drift.embeddingDimStats(stream, emb)

  /** Finish drained current-slice state against a reference stats
    * table — identical output to batch `Drift.embeddingDrift` on the
    * same rows.
    */
  def driftFrom(refStats: DataFrame, curState: DataFrame): DataFrame =
    Drift.embeddingDriftFromStats(refStats, curState)
}
