package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** RAKE keyword extraction (Rose, Engel, Cramer & Cowley, "Automatic
  * Keyword Extraction from Individual Documents", 2010): candidate
  * phrases are maximal runs of consecutive non-stopword tokens;
  * each word scores degree/frequency over the doc's phrase set
  * (degree = Σ lengths of phrases containing it — words that live
  * in long phrases rank up, words that appear everywhere rank
  * down); a phrase scores the sum of its words. The cheap,
  * training-free doc-labeling pass: corpus browsers, dedup-cluster
  * naming, retrieval facets.
  *
  * Determinism: per-word scores are per-term-floored micros
  * (deg·10⁶ div freq — the house order-free integer convention);
  * phrase scores are exact integer sums of those; ranks break ties
  * by phrase text. Identical phrase occurrences in one doc carry
  * identical scores and collapse to one candidate row.
  *
  * Scale shape: everything is per-document — the explode/window/agg
  * chain partitions by doc id (one shuffle key, never global), word
  * stats join phrases within the doc key, and the final rank window
  * is per-doc. No corpus-wide state of any kind.
  */
object Rake {

  /** Top-k phrases per document: (doc, phrase, score_micros, rank).
    * `srcId` names the id column; stopwords delimit phrases.
    */
  def keywords(df: DataFrame, srcId: String, textCol: Column,
      stopwords: Seq[String], k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val toks = filter(split(lower(textCol), "\\s+"),
      t => length(t) > 0)
    val flagged = df
      .select(col(srcId).as("doc"),
        posexplode(toks).as(Seq("pos", "w")))
      .withColumn("stop",
        array_contains(array(stopwords.map(lit): _*), col("w")))
    val wOrd = Window.partitionBy("doc").orderBy("pos")
    val islands = flagged.filter(!col("stop"))
      .withColumn("isl", col("pos") - row_number().over(wOrd))
    val phrases = islands.groupBy("doc", "isl")
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("w")))),
        x => x.getField("w")).as("ws"))
      .withColumn("plen", size(col("ws")).cast("long"))
      .withColumn("phrase", concat_ws(" ", col("ws")))
    val words = phrases
      .select(col("doc"), col("isl"), col("phrase"), col("plen"),
        explode(col("ws")).as("w"))
    val stats = words.groupBy("doc", "w")
      .agg(count(lit(1)).as("freq"), sum("plen").as("deg"))
      .withColumn("wscore", expr("deg * 1000000 div freq"))
    val scored = words
      .join(stats.select(col("doc").as("sd"), col("w").as("sw"),
          col("wscore")),
        col("sd") === col("doc") && col("sw") === col("w"))
      .groupBy("doc", "isl", "phrase")
      .agg(sum("wscore").as("score_micros"))
      .select("doc", "phrase", "score_micros").distinct()
    val rw = Window.partitionBy("doc")
      .orderBy(desc("score_micros"), asc("phrase"))
    scored.withColumn("rank", row_number().over(rw))
      .filter(col("rank") <= k)
  }

  /** DuckDB oracle replaying [[keywords]]; `srcSql` must yield
    * (doc, text).
    */
  def keywordsOracleSql(srcSql: String, stopwords: Seq[String],
      k: Int): String = {
    val sw = stopwords.mkString("['", "', '", "']")
    s"""WITH t AS (SELECT doc,
       |    list_filter(regexp_split_to_array(lower(text), '\\s+'),
       |                x -> len(x) > 0) AS toks
       |  FROM ($srcSql)),
       |e AS (SELECT doc, unnest(range(len(toks))) AS pos, toks FROM t),
       |f AS (SELECT doc, pos, toks[pos + 1] AS w FROM e),
       |ns AS (SELECT doc, pos, w FROM f
       |       WHERE NOT list_contains($sw, w)),
       |isl AS (SELECT doc, pos, w,
       |          pos - ROW_NUMBER() OVER (PARTITION BY doc ORDER BY pos)
       |            AS isl
       |        FROM ns),
       |ph AS (SELECT doc, isl, CAST(COUNT(*) AS BIGINT) AS plen,
       |         string_agg(w, ' ' ORDER BY pos) AS phrase,
       |         LIST(w ORDER BY pos) AS ws
       |       FROM isl GROUP BY 1, 2),
       |wrd AS (SELECT doc, isl, phrase, plen, unnest(ws) AS w FROM ph),
       |st AS (SELECT doc, w, CAST(COUNT(*) AS BIGINT) AS freq,
       |         CAST(SUM(plen) AS BIGINT) AS deg
       |       FROM wrd GROUP BY 1, 2),
       |wsc AS (SELECT doc, w, deg * 1000000 // freq AS wscore FROM st),
       |sc AS (SELECT DISTINCT w0.doc, w0.phrase, s.score_micros FROM (
       |    SELECT doc, isl, phrase FROM ph) w0
       |  JOIN (SELECT wrd.doc, wrd.isl,
       |          CAST(SUM(wsc.wscore) AS BIGINT) AS score_micros
       |        FROM wrd JOIN wsc ON wsc.doc = wrd.doc AND wsc.w = wrd.w
       |        GROUP BY 1, 2) s
       |    ON s.doc = w0.doc AND s.isl = w0.isl),
       |rk AS (SELECT doc, phrase, score_micros,
       |         ROW_NUMBER() OVER (PARTITION BY doc
       |           ORDER BY score_micros DESC, phrase) AS rank
       |       FROM sc)
       |SELECT doc, phrase, score_micros, rank
       |FROM rk WHERE rank <= $k""".stripMargin
  }
}
