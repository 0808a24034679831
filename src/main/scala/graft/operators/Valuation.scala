package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column

/** Leave-one-source-out data valuation — "what does each source
  * actually contribute to the corpus": for every source, the corpus
  * metric recomputed WITHOUT that source, by algebra on per-source
  * sufficient statistics rather than |sources| corpus re-scans (the
  * Shapley-style data-valuation question collapsed to its exact
  * closed form for additive metrics; cf. Ghorbani & Zou, ICML'19 —
  * the marginal-contribution special case).
  *
  * Two metrics, both EXACT under deletion:
  *  - mean tokens/doc: mean(all) and mean(all − s) both derive from
  *    the global (N, S) and per-source (n_s, t_s) long sums — the
  *    LOO delta needs zero extra passes;
  *  - corpus distinct-text count: distinct(all) − distinct(all − s)
  *    = #texts occurring ONLY in s (a text survives deletion iff
  *    some other source also carries it) — so the non-additive
  *    distinct metric still has an exact per-source LOO, from one
  *    per-text agg.
  *
  * Scale shape: two map-side-combined scans of the corpus (one
  * grouped by source, one by text fingerprint), then all LOO algebra
  * on the sources-sized metadata table. Long capacity: token sums
  * ×10⁶ stay under 2⁶³ to ~9×10¹² corpus tokens; past that the two
  * products move to decimal(38) with the SQL shape unchanged.
  */
object Valuation {

  /** Per-source LOO table: n_docs, tok_sum, mean_tok_micros,
    * loo_mean_micros (corpus mean without this source; NULL when the
    * source IS the corpus), delta_micros (corpus mean − LOO mean:
    * positive = this source pulls the mean up), uniq_texts (exact
    * LOO loss in corpus distinct texts).
    */
  def leaveOneSourceOut(docs: DataFrame, source: String,
      text: Column): DataFrame = {
    val base = docs.select(col(source).as("source"), text.as("t"))
      .withColumn("toks",
        size(filter(split(col("t"), "\\s+"), x => length(x) > 0))
          .cast("long"))
    val per = base.groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("toks").as("tok_sum"))
    // texts occurring in exactly one source credit that source
    val uniq = base.groupBy("t")
      .agg(countDistinct(col("source")).as("ns"),
        min(col("source")).as("only_src"))
      .filter(col("ns") === 1)
      .groupBy(col("only_src").as("source"))
      .agg(count(lit(1)).as("uniq_texts"))
    val glob = per.agg(sum("n_docs").as("nn"), sum("tok_sum").as("ss"))
    per.crossJoin(broadcast(glob))
      .join(uniq, Seq("source"), "left")
      .na.fill(0L, Seq("uniq_texts"))
      .select(
        col("source"), col("n_docs"), col("tok_sum"),
        (col("tok_sum") * 1000000L / col("n_docs")).cast("long")
          .as("mean_tok_micros"),
        when(col("nn") > col("n_docs"),
          ((col("ss") - col("tok_sum")) * 1000000L
            / (col("nn") - col("n_docs"))).cast("long"))
          .as("loo_mean_micros"),
        when(col("nn") > col("n_docs"),
          (col("ss") * 1000000L / col("nn")).cast("long")
            - ((col("ss") - col("tok_sum")) * 1000000L
              / (col("nn") - col("n_docs"))).cast("long"))
          .as("delta_micros"),
        col("uniq_texts"))
  }

  /** DuckDB rendering of [[leaveOneSourceOut]]; `docsSql` must yield
    * (source, t). Token sums are all-positive, so `//` truncation
    * equals floor on both engines.
    */
  def leaveOneSourceOutOracleSql(docsSql: String): String =
    s"""WITH base AS (
       |  SELECT source, t,
       |         CAST(len(list_filter(regexp_split_to_array(t, '\\s+'),
       |                              x -> len(x) > 0)) AS BIGINT) AS toks
       |  FROM ($docsSql)),
       |per AS (SELECT source, COUNT(*) AS n_docs,
       |          CAST(SUM(toks) AS BIGINT) AS tok_sum
       |        FROM base GROUP BY 1),
       |uniq AS (SELECT only_src AS source, COUNT(*) AS uniq_texts
       |         FROM (SELECT t, COUNT(DISTINCT source) AS ns,
       |                 MIN(source) AS only_src FROM base GROUP BY t)
       |         WHERE ns = 1 GROUP BY 1),
       |gtot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS nn,
       |           CAST(SUM(tok_sum) AS BIGINT) AS ss FROM per)
       |SELECT per.source, per.n_docs, per.tok_sum,
       |       CAST(per.tok_sum * 1000000 // per.n_docs AS BIGINT)
       |         AS mean_tok_micros,
       |       CASE WHEN gtot.nn > per.n_docs THEN
       |         CAST((gtot.ss - per.tok_sum) * 1000000
       |              // (gtot.nn - per.n_docs) AS BIGINT) END
       |         AS loo_mean_micros,
       |       CASE WHEN gtot.nn > per.n_docs THEN
       |         CAST(gtot.ss * 1000000 // gtot.nn AS BIGINT)
       |         - CAST((gtot.ss - per.tok_sum) * 1000000
       |                // (gtot.nn - per.n_docs) AS BIGINT) END
       |         AS delta_micros,
       |       COALESCE(uniq.uniq_texts, 0) AS uniq_texts
       |FROM per CROSS JOIN gtot
       |LEFT JOIN uniq ON per.source = uniq.source""".stripMargin
}
