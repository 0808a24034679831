package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The pretraining-shard gate: repetition thresholds + token floor +
  * deterministic split, as ONE reusable transformation.
  *
  * Defined over a plain DataFrame, so the identical plan runs in batch
  * (q_pipe_pretrain_shard) and in Structured Streaming (readStream →
  * gate → writeStream) — the gate is stateless and deterministic
  * (single-pass expressions + integer hash split, no rand(), no
  * window), which is precisely what makes it streaming-safe with
  * exactly-once file sinks: replaying a micro-batch reproduces the
  * same rows bit-for-bit. StreamingGateSpec asserts batch ≡ streaming
  * on the same input.
  */
object CorpusGate {

  /** Filter + annotate: survivors get `n_tokens` and `split`.
    * Thresholds are the Gopher-style defaults used by the catalog
    * entry; fractions are exact-int divisions (engine-portable).
    */
  def pretrainGate(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      minTokens: Int = 30,
      maxTop2: Double = 0.05,
      maxDup3: Double = 0.10): DataFrame = {
    val rep = graft.expressions.TextRepetition(col(textCol))
    val qual = graft.expressions.TextQuality(col(textCol))
    val gated = docs
      .select(col(idCol),
        qual.getField("n_tokens").as("n_tokens"),
        rep.getField("top_2gram_frac").as("top2"),
        rep.getField("dup_3gram_frac").as("dup3"))
      .filter(col("n_tokens") >= minTokens &&
        col("top2") <= maxTop2 && col("dup3") <= maxDup3)
    Sampling.hashSplit(gated, idCol,
        Seq("train" -> 80, "val" -> 10, "test" -> 10))
      .select(col(idCol), col("n_tokens"), col("split"))
  }

  /** The repetition gate alone — Gopher-style n-gram repetition
    * thresholds as a standalone annotate-and-filter, for ingest paths
    * that score repetition without the full pretraining gate (token
    * floor + split). Stateless single-pass native expression, so the
    * identical plan runs batch and in Structured Streaming
    * (readStream → gate → writeStream) with bit-for-bit equal output
    * — StreamingGateSpec asserts it, mirroring [[pretrainGate]].
    */
  def repetitionGate(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      maxTop2: Double = 0.05,
      maxDup3: Double = 0.10): DataFrame = {
    val rep = graft.expressions.TextRepetition(col(textCol))
    docs
      .select(col(idCol),
        rep.getField("top_2gram_frac").as("top_2gram_frac"),
        rep.getField("dup_3gram_frac").as("dup_3gram_frac"))
      .filter(col("top_2gram_frac") <= maxTop2 &&
        col("dup_3gram_frac") <= maxDup3)
  }
}
