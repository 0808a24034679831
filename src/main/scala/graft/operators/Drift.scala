package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift monitors between a reference slice and a
  * current slice — the snapshot-to-snapshot complement of the
  * per-source TVD monitor (Queries.qTSourceDivergence): TVD asks
  * "does this source match the corpus", these ask "does today's
  * corpus match yesterday's".
  *
  *  - [[psiNumeric]]: Population Stability Index over fixed-width
  *    bins of a numeric column, the industry-standard model-input
  *    drift score (PSI < 0.1 stable, 0.1–0.25 watch, > 0.25 act).
  *  - [[chiSquaredCategorical]]: Pearson χ² statistic over a
  *    categorical column's contingency table.
  *
  * Determinism: bin counts are exact integers (fixed-width bins are
  * pure integer arithmetic — no percentile estimation, so the bin
  * edges replay in any engine); Laplace +1 smoothing keeps empty
  * bins finite. Only the FINAL per-bin contribution touches doubles
  * — a product of two correctly-rounded IEEE terms from exact
  * integer inputs, rounded at 6 dp, the house convention for
  * ln-bearing scores (same stability argument as the DSIR weights).
  *
  * Scale shape: each slice folds to a bins-sized count table in one
  * map-side-combined aggregation (the fact never shuffles — the
  * bin id is the shuffle key, cardinality = nBins); the join and
  * score arithmetic are metadata-sized. Adding slices (per-day
  * PSI series) adds rows to the count table, not scans.
  */
object Drift {

  /** Fixed-width bin id: floor((x - lo) / width), clamped to
    * [0, nBins). Values outside [lo, hi) clamp into the edge bins so
    * out-of-range drift still registers (standard PSI practice).
    */
  private def binId(x: Column, lo: Double, width: Double, nBins: Int): Column =
    least(greatest(floor((x - lit(lo)) / lit(width)).cast("long"), lit(0L)),
      lit(nBins - 1L))

  /** SQL rendering of [[binId]] for oracle replay. */
  def binIdSql(x: String, lo: Double, width: Double, nBins: Int): String =
    s"LEAST(GREATEST(CAST(FLOOR(($x - $lo) / $width) AS BIGINT), 0), ${nBins - 1})"

  /** Fixed-width bin counts — the bounded-key aggregation shared by
    * the batch monitor and [[graft.streaming.StreamDrift]] (the count
    * is an order-free sum over ≤ nBins keys, so the streaming
    * rendering is the same plan as a stateful streaming agg).
    * Output: (bin, `out`).
    */
  def binCounts(df: DataFrame, valueCol: String, lo: Double, hi: Double,
      nBins: Int, out: String): DataFrame = {
    require(nBins >= 2 && hi > lo, "need >= 2 bins over a real range")
    val width = (hi - lo) / nBins
    df.groupBy(binId(col(valueCol), lo, width, nBins).as("bin"))
      .agg(count(lit(1)).as(out))
  }

  /** PSI finish over two bin-count tables (bin, n_ref) / (bin, n_cur)
    * — all arithmetic identical to [[psiNumeric]], so a streamed
    * current-side state finishes to the exact batch result.
    */
  def psiFromCounts(r: DataFrame, c: DataFrame, nBins: Int): DataFrame = {
    // joined and contrib are bins-sized but each is referenced TWICE
    // (totals + per-bin output); left lazy, every reference replays
    // the upstream FACT aggregation — the plan audit counted 8 fact
    // scans. localCheckpoint pins the <=nBins rows so the fact is
    // scanned exactly once per slice.
    val joined = r.join(c, Seq("bin"), "full_outer")
      .select(col("bin"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
      .localCheckpoint()
    val tot = joined.agg(sum("n_ref").as("t_ref"), sum("n_cur").as("t_cur"))
    // smoothed proportions: p = (n + 1) / (t + nBins); contribution
    // (p_c - p_r) * ln(p_c / p_r) with the ratio as the quotient of
    // the two already-rounded double proportions — each a single IEEE
    // division of exact integers, so both engines ln the identical
    // double at ANY count scale (the earlier long*long product
    // spelling overflowed past ~2^63/t rows per slice)
    val pr = (col("n_ref") + 1).cast("double") / (col("t_ref") + nBins)
    val pc = (col("n_cur") + 1).cast("double") / (col("t_cur") + nBins)
    val contrib = joined.crossJoin(broadcast(tot))
      .select(col("bin"), col("n_ref"), col("n_cur"),
        round((pc - pr) * log(pc / pr), 6).as("psi_bin"))
      .localCheckpoint()
    val total = contrib.agg(round(sum("psi_bin"), 6).as("psi_total"))
    contrib.crossJoin(broadcast(total)).orderBy("bin")
  }

  /** Per-bin PSI contributions plus their running total. Output:
    * (bin, n_ref, n_cur, psi_bin, psi_total) — one row per bin id
    * 0..nBins-1 (bins empty in BOTH slices are absent; they
    * contribute 0 by the smoothing identity p_r = p_c).
    */
  def psiNumeric(ref: DataFrame, cur: DataFrame, valueCol: String,
      lo: Double, hi: Double, nBins: Int): DataFrame =
    psiFromCounts(
      binCounts(ref, valueCol, lo, hi, nBins, "n_ref"),
      binCounts(cur, valueCol, lo, hi, nBins, "n_cur"), nBins)

  /** Pearson χ² over a categorical column: observed = current counts,
    * expected = reference proportions scaled to the current total
    * (+1 smoothing both sides). Output: (cat, n_ref, n_cur, chi2_cat,
    * chi2_total), one row per category present in either slice. A
    * NULL category is a real category (unlabeled rows drift too): the
    * count tables pair on NULL-SAFE equality, so NULL-in-both yields
    * ONE paired row — a plain full-outer equi-join never matches NULL
    * keys and would double-count the smoothing penalty as two
    * half-rows, each seeing the other side's count as 0.
    */
  def chiSquaredCategorical(ref: DataFrame, cur: DataFrame,
      catCol: String): DataFrame = {
    def counts(df: DataFrame, cat: String, out: String) = df
      .groupBy(col(catCol).as(cat)).agg(count(lit(1)).as(out))
    val joined = counts(ref, "cat_r", "n_ref")
      .join(counts(cur, "cat_c", "n_cur"),
        col("cat_r") <=> col("cat_c"), "full_outer")
      .select(coalesce(col("cat_r"), col("cat_c")).as("cat"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    val tot = joined.agg(sum("n_ref").as("t_ref"), sum("n_cur").as("t_cur"),
      count(lit(1)).as("k"))
    // expected_c = (n_ref + 1) / (t_ref + k) * (t_cur + k); observed
    // = n_cur + 1; the ratio divides BEFORE the scale multiply so no
    // integer product can overflow at any count scale (each factor is
    // one correctly-rounded IEEE op from exact integers)
    val e = (col("n_ref") + 1).cast("double") /
      (col("t_ref") + col("k")).cast("double") *
      (col("t_cur") + col("k")).cast("double")
    val o = (col("n_cur") + 1).cast("double")
    val contrib = joined.crossJoin(broadcast(tot))
      .select(col("cat"), col("n_ref"), col("n_cur"),
        round((o - e) * (o - e) / e, 6).as("chi2_cat"))
    val total = contrib.agg(round(sum("chi2_cat"), 6).as("chi2_total"))
    contrib.crossJoin(broadcast(total)).orderBy("cat")
  }

  /** 1-D earth mover's distance between two binned distributions —
    * the drift metric PSI can't be: EMD sees HOW FAR mass moved, not
    * just that bin shares changed (a one-bin shift and a ten-bin
    * shift score identically under PSI's per-bin ratios), and it
    * needs no smoothing constant because empty bins are legal. For
    * sorted unit-width bins, EMD = Σ |CDF_ref − CDF_cur| — computed
    * EXACTLY over the common denominator t_ref·t_cur (decimal
    * products; the cross-multiplied cumulative diff avoids any
    * division until the final floor), so the whole metric is integer
    * arithmetic on the bins-sized metadata table. Output: per-bin
    * |cdf diff| in ppm plus the exact-total EMD (1-norm of the CDF
    * gap, in ppm of one bin width) AND the Kolmogorov–Smirnov D
    * (its sup-norm) — one cum table prices both.
    */
  /** Mann–Whitney rank-sum drift test (1947): U and the AUC effect
    * size for "is the current slice stochastically LARGER than the
    * reference" — the nonparametric location test beside PSI/EMD/chi²
    * (PSI/EMD see distribution change, U answers the directional
    * question with an effect size: AUC = P(cur > ref) + ½P(=)).
    * Exact-integer throughout: the pooled sample folds to a value
    * histogram (integer-valued or pre-binned values — one
    * map-side-combined agg), midranks come from prefix sums in
    * DOUBLED units (midrank·2 = 2·cumBefore + cnt + 1, always
    * integer), U₂ = Σ n_cur(v)·rank2(v) − n_cur(n_cur+1) = 2U, and
    * auc_ppm = floor(10⁶·U₂ / (2·n_ref·n_cur)). Everything after the
    * two count scans runs on the distinct-value metadata table.
    */
  def rankSumAuc(ref: DataFrame, cur: DataFrame, valueCol: String)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = "decimal(38,0)"
    def hist(df: DataFrame, out: String) =
      df.select(col(valueCol).cast("long").as("v"))
        .groupBy("v").agg(count(lit(1)).as(out))
    val j = hist(ref, "nr").join(hist(cur, "nc"), Seq("v"), "full_outer")
      .select(col("v"), coalesce(col("nr"), lit(0L)).as("nr"),
        coalesce(col("nc"), lit(0L)).as("nc"))
      .withColumn("cnt", col("nr") + col("nc"))
    val w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    j.withColumn("cumb", coalesce(sum("cnt").over(w), lit(0L)))
      .withColumn("rank2", lit(2L) * col("cumb") + col("cnt") + 1)
      .agg(sum("nr").as("n_ref"), sum("nc").as("n_cur"),
        sum(col("nc").cast(dec) * col("rank2")).as("s2"))
      .select(col("n_ref"), col("n_cur"),
        (col("s2") - col("n_cur").cast(dec) * (col("n_cur") + 1))
          .cast("long").as("u2_cur"),
        when(col("n_ref") > 0 && col("n_cur") > 0, expr(
          """((s2 - CAST(n_cur AS DECIMAL(38,0)) * (n_cur + 1)) * 1000000)
            | div (2 * CAST(n_ref AS DECIMAL(38,0)) * n_cur)"""
            .stripMargin)).cast("long").as("auc_ppm"))
  }

  /** Join separately-built ref/cur bin-count sides (full outer,
    * absent bins = 0) and finish with [[emdFromCounts]] — the shared
    * finish for the batch monitor and streaming/StreamEmd's drained
    * state.
    */
  def emdFromSides(refCounts: DataFrame, curCounts: DataFrame): DataFrame =
    emdFromCounts(
      refCounts.join(curCounts, Seq("bin"), "full_outer")
        .select(col("bin"),
          coalesce(col("n_ref"), lit(0L)).as("n_ref"),
          coalesce(col("n_cur"), lit(0L)).as("n_cur")))

  def emdFromCounts(binned: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = "decimal(38,0)"
    val w = Window.orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = binned.agg(sum("n_ref").cast(dec).as("tr"),
      sum("n_cur").cast(dec).as("tc"))
    val cum = binned
      .withColumn("cr", sum("n_ref").over(w).cast(dec))
      .withColumn("cc", sum("n_cur").over(w).cast(dec))
      .crossJoin(broadcast(tot))
      .withColumn("dabs",
        abs(col("cr") * col("tc") - col("cc") * col("tr")))
    val total = cum.agg(
      expr("(sum(dabs) * 1000000) div (max(tr) * max(tc))")
        .as("emd_ppm_total"),
      // Kolmogorov–Smirnov rides the same cum table: D = max |CDF
      // diff| — the sup-norm where EMD is the 1-norm; both exact
      expr("(max(dabs) * 1000000) div (max(tr) * max(tc))")
        .as("ks_ppm_total"))
    cum.crossJoin(broadcast(total))
      .select(col("bin"), col("n_ref"), col("n_cur"),
        expr("(dabs * 1000000) div (tr * tc)").as("cdf_diff_ppm"),
        col("emd_ppm_total"), col("ks_ppm_total"))
  }

  /** Per-dimension drift of an embedding column between a reference
    * and a current slice — the monitor that catches "the encoder
    * changed / the corpus mix moved" BEFORE an ANN index or a
    * semantic-dedup threshold silently rots: per-dim micros means of
    * both slices and their signed delta. Mean shift is the
    * first-moment read; dims with the largest |delta| name WHAT
    * moved (cf. PSI for scalar features — this is its vector
    * sibling).
    *
    * Determinism: each float is widened to double (exact) and
    * floored to micros; per-dim sums are exact longs; the mean is
    * the house floor-division (numerator pre-adjusted by the true
    * mod so any div semantics agree) — identical to the centroid
    * arithmetic in Similarity.groupCentroidMicros.
    *
    * Scale shape: the fact folds ONCE per slice to a dim-sized
    * stats table ([[embeddingDimStats]] — map-side combined, shuffle
    * key cardinality = dim); all drift arithmetic is a dim-sized
    * join. Streaming sibling: StreamEmbeddingDrift maintains the
    * current slice's stats incrementally (order-free exact sums)
    * and finishes through the SAME [[embeddingDriftFromStats]].
    */
  def embeddingDrift(df: DataFrame, isRef: Column,
      emb: Column): DataFrame =
    embeddingDriftFromStats(
      embeddingDimStats(df.filter(isRef), emb),
      embeddingDimStats(df.filter(!isRef), emb))

  /** (pos, sm, n): exact per-dimension micros sums + counts — the
    * mergeable sufficient statistics (and streaming-agg state).
    */
  def embeddingDimStats(df: DataFrame, emb: Column): DataFrame =
    df.select(posexplode(emb).as(Seq("pos", "x")))
      .select(col("pos"),
        floor(col("x").cast("double") * 1000000).cast("long").as("xm"))
      .groupBy("pos")
      .agg(sum("xm").as("sm"), count(lit(1)).as("n"))

  /** Finish: join the two dim-stats tables and floor-divide to
    * means; delta = cur − ref in signed micros.
    */
  def embeddingDriftFromStats(ref: DataFrame, cur: DataFrame): DataFrame = {
    val mean = (sm: String, n: String) =>
      expr(s"($sm - (($sm % $n) + $n) % $n) div $n")
    ref.select(col("pos").as("rpos"), col("sm").as("rsm"),
        col("n").as("n_ref"))
      .join(cur.select(col("pos"), col("sm").as("csm"),
        col("n").as("n_cur")), col("rpos") === col("pos"))
      .select(col("pos"), col("n_ref"), col("n_cur"),
        mean("rsm", "n_ref").as("mean_ref_micros"),
        mean("csm", "n_cur").as("mean_cur_micros"))
      .withColumn("delta_micros",
        col("mean_cur_micros") - col("mean_ref_micros"))
  }

  /** DuckDB oracle replaying [[embeddingDrift]]; `srcSql` must yield
    * (is_ref BOOLEAN, v) with v the embedding array.
    */
  def embeddingDriftOracleSql(srcSql: String): String =
    s"""WITH src AS ($srcSql),
       |e AS (SELECT is_ref, unnest(range(len(v))) AS pos, v FROM src),
       |m AS (SELECT is_ref, pos,
       |        CAST(floor(CAST(v[pos + 1] AS DOUBLE) * 1000000) AS BIGINT)
       |          AS xm
       |      FROM e),
       |g AS (SELECT is_ref, pos, CAST(SUM(xm) AS BIGINT) AS sm,
       |        CAST(COUNT(*) AS BIGINT) AS n
       |      FROM m GROUP BY 1, 2),
       |r AS (SELECT pos, n AS n_ref,
       |        (sm - ((sm % n) + n) % n) // n AS m_ref
       |      FROM g WHERE is_ref),
       |c AS (SELECT pos, n AS n_cur,
       |        (sm - ((sm % n) + n) % n) // n AS m_cur
       |      FROM g WHERE NOT is_ref)
       |SELECT pos, n_ref, n_cur, m_ref AS mean_ref_micros,
       |       m_cur AS mean_cur_micros, m_cur - m_ref AS delta_micros
       |FROM r JOIN c USING (pos)""".stripMargin
}
