package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** TF-IDF scoring over a document corpus — the classic relevance /
  * keyword-extraction signal for an LLM data pipeline (salient-term
  * tagging, near-boilerplate detection via low-idf mass).
  *
  * Scale shape: the token explode is map-side; term frequencies
  * shuffle once on (doc, term); document frequencies reduce the tf
  * table by term — the df/idf table is VOCABULARY-sized (sub-linear
  * in corpus size; Heaps' law), so at 100 TB it either broadcasts or
  * hash-joins by term, and the per-doc top-k runs on the
  * TopKPerGroup heap plan (no per-document sort). No driver-side
  * collection anywhere: the corpus size enters as a broadcast grand
  * aggregate, the same pattern as the A2 min-max normalize.
  *
  * idf uses sklearn's smoothed form ln((N+1)/(df+1)) + 1 (never
  * zero, no division by zero for unseen terms).
  */
object TfIdf {

  /** (id, term, tf) — term frequencies per document. */
  def termFreq(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"),
        explode(TextOps.tokens(col(textCol))).as("term"))
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))

  /** (term, df, idf) — vocabulary-sized. `nDocs` rides in as a
    * broadcast grand agg, not a driver action.
    */
  def idfTable(tf: DataFrame, docs: DataFrame): DataFrame = {
    val n = docs.agg(count(lit(1)).as("n_docs"))
    tf.groupBy("term").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(n))
      .withColumn("idf",
        log((col("n_docs") + lit(1.0)) / (col("df") + lit(1.0))) + lit(1.0))
      .select("term", "df", "idf")
  }

  /** (id, term, tf, score) — the full scored posting table. */
  def scores(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = termFreq(docs, idCol, textCol)
    tf.join(idfTable(tf, docs), Seq("term"))
      .withColumn("score", col("tf") * col("idf"))
      .select("id", "term", "tf", "score")
  }

  /** Top-k salient terms per document by TF-IDF (heap plan; ties by
    * term). Output: (id, term, tf, score, rank).
    */
  def topTerms(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame =
    TopK.perGroup(scores(docs, idCol, textCol), Seq("id"),
      Seq(col("score").desc, col("term")), k, rankName = "rank")
      .select("id", "term", "tf", "score", "rank")
}
