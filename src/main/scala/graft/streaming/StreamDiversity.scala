package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.operators.Similarity

/** Streaming per-source embedding diversity: the moment-identity
  * sufficient statistics of [[graft.operators.Similarity.meanPairwiseCosine]]
  * running as a stateful streaming aggregation, finished per
  * micro-batch to mean-pairwise-cosine ppm — a live "is this source's
  * embedding space collapsing" monitor over an ingest stream (a
  * crawler that starts looping, a generator in mode collapse, a
  * near-dup storm all push mean cosine toward 10⁶).
  *
  * Why this is safe to stream (the house argument): state is dim rows
  * per group of (Σ quantized component, Σ‖·‖² diagonal, count) — all
  * EXACT long sums, order-free merges — so Spark's incremental
  * streaming agg maintains exactly the batch statistics regardless of
  * micro-batch boundaries. State is O(groups·dim); the ppm finish
  * ([[Similarity.meanPairwiseCosineFromSums]]) is shared arithmetic
  * with the batch operator, so drained state finishes to the
  * BIT-EXACT batch answer of the same rows — StreamDiversitySpec
  * proves batch ≡ streaming, the house requirement for every
  * streaming operator. The O(n²) pair question never materializes in
  * either face: the identity Σ_{i≠j} v̂ᵢ·v̂ⱼ = ‖Σ v̂‖² − Σ‖v̂‖² is what
  * makes a STREAMING diversity monitor possible at all.
  */
object StreamDiversity {

  /** Streaming sufficient-statistics state (group, pos, s, d0, n0);
    * update/complete output modes.
    */
  def posSums(stream: DataFrame, group: String, vecCol: String): DataFrame =
    Similarity.diversityPosSums(stream, group, vecCol)

  /** Finish drained state to (group, n, mean_cos_ppm) — identical
    * output to the batch `Similarity.meanPairwiseCosine` on the same
    * rows.
    */
  def diversityFrom(state: DataFrame, group: String): DataFrame =
    Similarity.meanPairwiseCosineFromSums(state, group)
}
