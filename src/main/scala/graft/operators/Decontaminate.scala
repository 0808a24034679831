package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: find (and drop) training documents that
  * share word n-grams with an evaluation set — the standard guard
  * against test-set leakage into a pretraining corpus (the GPT-3
  * appendix-C / PaLM / Llama recipe: exact n-gram collision, n≈8-13
  * for prose; lower for short or low-entropy text).
  *
  * Scale shape: the EVAL side is always small (benchmark suites), so
  * its distinct shingles broadcast; the 100 TB corpus side streams
  * map-side through the hash join — no corpus shuffle at all until
  * the per-(doc, eval) overlap count, whose input is only the
  * colliding rows. Contrast with dedup's self-join, which must
  * shuffle the corpus: contamination is corpus × tiny, and the plan
  * should (and does) exploit that asymmetry.
  */
object Decontaminate {

  /** Overlap report: one row per (doc, eval) pair sharing ≥ `minShared`
    * distinct word `w`-grams, with the shared-gram count.
    */
  def overlaps(
      docs: DataFrame, docId: String, docText: String,
      evals: DataFrame, evalId: String, evalText: String,
      w: Int = 8, minShared: Int = 1): DataFrame = {
    // shinglesStrict: a doc (or eval) shorter than w tokens emits NO
    // grams — the whole-text fallback the dedup paths use would let a
    // 2-token doc register a spurious whole-text collision here.
    val d = docs.select(col(docId).as("doc_id"),
      explode(TextOps.shinglesStrict(col(docText), w)).as("g"))
    val e = evals.select(col(evalId).as("eval_id"),
      explode(TextOps.shinglesStrict(col(evalText), w)).as("g"))
    d.join(broadcast(e), Seq("g"))
      .groupBy("doc_id", "eval_id")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** The corpus minus every document contaminated against `evals` —
    * a broadcast anti-semi-join; the corpus never shuffles.
    */
  def clean(
      docs: DataFrame, docId: String, docText: String,
      evals: DataFrame, evalId: String, evalText: String,
      w: Int = 8, minShared: Int = 1): DataFrame = {
    val bad = overlaps(docs, docId, docText, evals, evalId, evalText,
      w, minShared).select(col("doc_id").as(docId)).distinct()
    docs.join(broadcast(bad), Seq(docId), "left_anti")
  }
}
