package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rank-stability audit between two scoring functions — the
  * scorer-version drift monitor: when a quality/importance scorer is
  * retrained or re-prompted, "did the RANKING the pipeline acts on
  * actually change?" is the deploy gate, not the score values. Over
  * the top-k documents by scorer A: Kendall τ-b between A's and B's
  * scores (tie-corrected — coarse scores tie constantly) plus the
  * top-k set Jaccard under each scorer (threshold decisions read set
  * membership; τ reads order).
  *
  * Scale shape: both top-k selections are TakeOrdered heaps (never a
  * global sort of the corpus); ALL pairwise work runs on the k-row
  * metadata frame — k²/2 comparison rows at k = 400 is 80k, corpus
  * size never enters the quadratic term. One conditional-agg pass
  * over the pair frame yields every sufficient statistic.
  *
  * Determinism: scores enter as exact longs; concordance is the sign
  * of an integer product (|score| ≤ 10⁹ ⇒ products ≤ 10¹⁸, exact);
  * τ-b's finish is a fixed sequence of IEEE ops on exact integers
  * (the assortativity convention) rounded at 6 dp; a fully-tied side
  * (zero denominator) reports τ = 0, mirrored in the oracle.
  *
  * Output (1 row): n, n_pairs, concordant, discordant, ties_a,
  * ties_b, tau_b, topk_jaccard_micros.
  */
object RankStability {

  def compare(df: DataFrame, idCol: Column, scoreA: Column,
      scoreB: Column, k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    // NOT checkpointed: both TakeOrdered heaps read the (columnar,
    // pruned) source directly — materializing a corpus-sized 3-long
    // projection to block storage to save one scan would be the only
    // fact-scale checkpoint in the library, against this operator's
    // own "corpus size never enters the heavy terms" contract
    val base = df.select(idCol.cast("long").as("id"),
      scoreA.cast("long").as("a"), scoreB.cast("long").as("b"))
    val top = base.orderBy(desc("a"), asc("id")).limit(k)
      .localCheckpoint() // k rows, referenced three times
    val l = top.select(col("id").as("i"), col("a").as("ai"),
      col("b").as("bi"))
    val r = top.select(col("id").as("j"), col("a").as("aj"),
      col("b").as("bj"))
    val sgn = (col("ai") - col("aj")) * (col("bi") - col("bj"))
    // coalesce mirrors the oracle: with < 2 rows the pair frame is
    // empty and bare SUMs would be NULL where the oracle reports 0
    val pairAgg = l.join(r, col("i") < col("j"))
      .agg(count(lit(1)).as("n_pairs"),
        coalesce(sum(when(sgn > 0, 1L).otherwise(0L)), lit(0L))
          .as("concordant"),
        coalesce(sum(when(sgn < 0, 1L).otherwise(0L)), lit(0L))
          .as("discordant"),
        coalesce(sum(when(col("ai") === col("aj"), 1L).otherwise(0L)),
          lit(0L)).as("ties_a"),
        coalesce(sum(when(col("bi") === col("bj"), 1L).otherwise(0L)),
          lit(0L)).as("ties_b"))
    val nDf = top.agg(count(lit(1)).as("n"))
    val topB = base.orderBy(desc("b"), asc("id")).limit(k)
    val interDf = top.select("id").join(topB.select("id"), Seq("id"))
      .agg(count(lit(1)).as("top_inter"))
    val denom = (col("n_pairs") - col("ties_a")).cast("double") *
      (col("n_pairs") - col("ties_b")).cast("double")
    pairAgg.crossJoin(broadcast(nDf)).crossJoin(broadcast(interDf))
      .select(col("n"), col("n_pairs"), col("concordant"),
        col("discordant"), col("ties_a"), col("ties_b"),
        when(denom > 0,
          round((col("concordant") - col("discordant")).cast("double")
            / sqrt(denom), 6)).otherwise(lit(0.0)).as("tau_b"),
        // empty-input guard like tau_b's: 2n − inter is 0 only when
        // the corpus is empty — report 0, matching the oracle's CASE
        when(col("n") > 0,
          expr("top_inter * 1000000 div (2 * n - top_inter)"))
          .otherwise(lit(0L)).as("topk_jaccard_micros"))
  }

  /** Rank-biased overlap (Webber, Moffat & Zobel, TOIS 2010) between
    * the two scorers' rankings at persistence p = 9/10 — the
    * top-weighted complement to τ-b (which weights every pair
    * equally; RBO weights depth d by p^{d−1}, matching how a
    * pipeline actually consumes a ranking: the head matters most).
    * Truncated prefix form: RBO@k = (1−p)·Σ_{d≤k} p^{d−1}·X_d/d with
    * X_d = |top-d(A) ∩ top-d(B)|. Every term is an exact integer
    * floor: (1−p)p^{d−1} = 9^{d−1}/10^d exactly, so term_d =
    * floor(X_d·9^{d−1}·10⁶ / (d·10^d)) — the per-term-floors
    * contract, replayed verbatim in SQL from the same generated
    * constant table. All work after the two heap top-k's runs on
    * ≤ k rank rows + a k-row depth spine — metadata. Output: one row
    * per depth (d, x, term_micros, rbo_cum_micros); row d = k
    * carries the RBO.
    */
  def rbo(df: DataFrame, idCol: Column, scoreA: Column,
      scoreB: Column, k: Int): DataFrame = {
    require(k >= 1 && k <= 12,
      s"rbo: k must be in [1,12] (9^k·10⁶ long bound), got $k")
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(idCol.cast("long").as("id"),
      scoreA.cast("long").as("a"), scoreB.cast("long").as("b"))
    // global windows are fine HERE: they sort the k-row heap output,
    // never the corpus
    def ranked(s: String, out: String) =
      base.orderBy(desc(s), asc("id")).limit(k)
        .withColumn(out,
          row_number().over(Window.orderBy(desc(s), asc("id"))))
        .select(col("id"), col(out))
    val mr = ranked("a", "ra").join(ranked("b", "rb"), Seq("id"))
      .select(greatest(col("ra"), col("rb")).as("m"))
    val spine = (1 to k).map { d =>
      val num = (1 until d).foldLeft(1000000L)((acc, _) => acc * 9L)
      val den = d.toLong * (1 to d).foldLeft(1L)((acc, _) => acc * 10L)
      (d, num, den)
    }.toDF("d", "num", "den")
    spine.join(mr, lit(true), "left")
      .groupBy("d", "num", "den")
      .agg(sum(when(col("m") <= col("d"), 1L).otherwise(0L)).as("x"))
      .withColumn("term_micros", expr("(x * num) div den"))
      .withColumn("rbo_cum_micros",
        sum("term_micros").over(Window.orderBy("d")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("d"), col("x"), col("term_micros"),
        col("rbo_cum_micros"))
  }

  /** SQL constant table for [[rbo]]'s depth spine — generated from
    * the same fold so the engines cannot drift.
    */
  def rboSpineSql(k: Int): String =
    (1 to k).map { d =>
      val num = (1 until d).foldLeft(1000000L)((acc, _) => acc * 9L)
      val den = d.toLong * (1 to d).foldLeft(1L)((acc, _) => acc * 10L)
      s"($d, ${num}, ${den})"
    }.mkString(", ")

  /** Oracle rendering — identical heap-ranked top-k, pair statistics,
    * and τ-b finish; `srcSql` yields (id, a, b). Ends at CTE
    * `rs(n, n_pairs, concordant, discordant, ties_a, ties_b, tau_b,
    * topk_jaccard_micros)`.
    */
  def oracleSql(srcSql: String, k: Int): String =
    s"""base AS ($srcSql),
       |ta AS (SELECT id, a, b FROM (
       |         SELECT *, ROW_NUMBER() OVER (ORDER BY a DESC, id) AS rn
       |         FROM base) WHERE rn <= $k),
       |tb AS (SELECT id FROM (
       |         SELECT *, ROW_NUMBER() OVER (ORDER BY b DESC, id) AS rn
       |         FROM base) WHERE rn <= $k),
       |pg AS (SELECT COUNT(*) AS n_pairs,
       |         CAST(COALESCE(SUM(CASE WHEN (l.a - r.a) * (l.b - r.b) > 0
       |                       THEN 1 END), 0) AS BIGINT) AS concordant,
       |         CAST(COALESCE(SUM(CASE WHEN (l.a - r.a) * (l.b - r.b) < 0
       |                       THEN 1 END), 0) AS BIGINT) AS discordant,
       |         CAST(COALESCE(SUM(CASE WHEN l.a = r.a THEN 1 END), 0)
       |           AS BIGINT) AS ties_a,
       |         CAST(COALESCE(SUM(CASE WHEN l.b = r.b THEN 1 END), 0)
       |           AS BIGINT) AS ties_b
       |       FROM ta l JOIN ta r ON l.id < r.id),
       |nn AS (SELECT COUNT(*) AS n FROM ta),
       |ii AS (SELECT COUNT(*) AS top_inter FROM ta JOIN tb USING (id)),
       |rs AS (SELECT n, n_pairs, concordant, discordant, ties_a, ties_b,
       |         CASE WHEN CAST(n_pairs - ties_a AS DOUBLE)
       |                   * CAST(n_pairs - ties_b AS DOUBLE) > 0
       |              THEN ROUND(CAST(concordant - discordant AS DOUBLE)
       |                / sqrt(CAST(n_pairs - ties_a AS DOUBLE)
       |                       * CAST(n_pairs - ties_b AS DOUBLE)), 6)
       |              ELSE 0.0 END AS tau_b,
       |         CASE WHEN n > 0
       |              THEN top_inter * 1000000 // (2 * n - top_inter)
       |              ELSE CAST(0 AS BIGINT) END AS topk_jaccard_micros
       |       FROM pg CROSS JOIN nn CROSS JOIN ii)""".stripMargin
}
