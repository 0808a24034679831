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

  /** Per-document contamination SCORE: the fraction of the doc's
    * distinct `w`-grams that appear anywhere in the eval set — the
    * graded signal used to TUNE a decontamination threshold (the
    * boolean `clean` gate is the deployed policy; this is its
    * calibration report, and a partial-overlap detector the
    * any-collision gate can't express). Every input doc appears in
    * the output: docs too short to emit grams score 0.0.
    *
    * Scale shape identical to [[overlaps]]: the eval gram UNION
    * broadcasts once; the corpus streams map-side through a broadcast
    * LEFT join (hit-marking, never filtering), then one map-side-
    * combining per-doc count — the corpus' only shuffle is doc-sized
    * count partials. The fraction is one double division on exact
    * integer counts.
    */
  def contaminationScore(
      docs: DataFrame, docId: String, docText: String,
      evals: DataFrame, evalText: String,
      w: Int = 8): DataFrame = {
    val evalGrams = evals
      .select(explode(TextOps.shinglesStrict(col(evalText), w)).as("g"))
      .distinct()
      .withColumn("hit", lit(1))
    docs
      .select(col(docId).as("doc_id"),
        explode_outer(TextOps.shinglesStrict(col(docText), w)).as("g"))
      .join(broadcast(evalGrams), Seq("g"), "left")
      .groupBy("doc_id")
      .agg(count(col("g")).as("n_grams"), count(col("hit")).as("n_hit"))
      .withColumn("contamination",
        when(col("n_grams") === 0, lit(0.0))
          .otherwise(col("n_hit").cast("double") / col("n_grams")))
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
