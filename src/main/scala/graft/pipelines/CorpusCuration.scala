package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.expressions.{LangId, TextQuality}
import graft.operators.Dedup

/** The canonical LLM training-data curation flow — the reason the
  * dedup/text operators exist — composed end-to-end as ONE lazy plan
  * over a documents table:
  *
  *   1. exact dedup: md5-digest groupBy, keep the min-id copy;
  *   2. near-dup removal: MinHash+LSH pairs (deterministic poly
  *      sketches, capped band join) with the greedy survivor rule
  *      "drop every id that appears as the larger side of a ≥θ pair"
  *      — deterministic and engine-replayable (a connected-component
  *      rule would need iterative closure; at curation scale the
  *      greedy rule is the standard choice);
  *   3. language gate: native LangId == keepLang;
  *   4. quality gate: native TextQuality token floor.
  *
  * Every stage shuffles by key (digest / band bucket / doc id) — no
  * stage is all-pairs or single-partition, so the same plan curates a
  * 100 TB corpus. The whole composition is oracle-exact: the catalog
  * entry `q_pipe_corpus_curation` replays all four stages in DuckDB.
  */
object CorpusCuration {

  def curate(
      docs: DataFrame, // (doc_id, text, ...)
      keepLang: String = "en",
      minTokens: Int = 10,
      minJaccard: Double = 0.5): DataFrame = {
    val deduped = Dedup.exactDedup(docs, "doc_id", "text")
    val nearPairs = Dedup.minhashNearDupsPoly(
      deduped, "doc_id", "text", minJaccard = minJaccard)
    val dropIds = nearPairs.select(col("id_b").as("doc_id")).distinct()
    val survivors = deduped.join(dropIds, Seq("doc_id"), "left_anti")
    val q = TextQuality(col("text"))
    survivors
      .select(col("doc_id"), LangId(col("text")).as("lang_pred"),
        q.getField("n_tokens").as("n_tokens"),
        q.getField("stopword_ratio").as("stopword_ratio"))
      .filter(col("lang_pred") === keepLang && col("n_tokens") >= minTokens)
  }
}
