package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Clustering-agreement metrics (Rand index and Adjusted Rand Index,
  * Hubert & Arabie '85) between two label columns over the same row
  * set — the label-permutation-invariant way to score one partition
  * of a corpus against another (predicted language vs metadata
  * source, two dedup policies' cluster labels, sharding vs semantic
  * clusters, ...).
  *
  * Everything reduces over the CONTINGENCY TABLE n_ij =
  * |{rows: a=i ∧ b=j}|:
  *   S_ij = Σ_ij C(n_ij,2),  S_a = Σ_i C(a_i,2),  S_b = Σ_j C(b_j,2)
  *   rand = (C(n,2) + 2·S_ij − S_a − S_b) / C(n,2)
  *   ari  = (S_ij − S_a·S_b/C(n,2))
  *          / ((S_a+S_b)/2 − S_a·S_b/C(n,2))
  *
  * Scale shape: ONE map-side-combined groupBy(a,b) collapses the fact
  * to the contingency table (|labels_a|·|labels_b| rows — metadata);
  * marginals and pair sums are aggs over that table. No window, no
  * join against the fact, partitioning-invariant exact-integer pair
  * counts with one documented double division at the end (n < 2^26
  * keeps S_a·S_b exact in double; beyond that lift to DECIMAL(38) —
  * the query shape is unchanged).
  *
  * ARI is undefined (0/0) when both labelings are all-singletons or
  * one label covers everything; callers own that degenerate case.
  */
object ClusterAgreement {

  /** One row: n, k_a, k_b, rand, ari (both rounded 6dp). */
  def ari(labels: DataFrame, aCol: String, bCol: String): DataFrame = {
    val ct = labels.groupBy(col(aCol).as("la"), col(bCol).as("lb"))
      .agg(count(lit(1)).as("nij"))
    def c2(c: org.apache.spark.sql.Column) = (c * (c - 1) / 2).cast("long")
    val sij = ct.agg(sum(c2(col("nij"))).as("s_ij"),
      sum(col("nij")).as("n"))
    val sa = ct.groupBy("la").agg(sum("nij").as("ai"))
      .agg(sum(c2(col("ai"))).as("s_a"), count(lit(1)).as("k_a"))
    val sb = ct.groupBy("lb").agg(sum("nij").as("bj"))
      .agg(sum(c2(col("bj"))).as("s_b"), count(lit(1)).as("k_b"))
    sij.crossJoin(broadcast(sa)).crossJoin(broadcast(sb))
      .select(col("n"), col("k_a"), col("k_b"),
        round((lit(1.0) * (c2(col("n")) + lit(2) * col("s_ij")
            - col("s_a") - col("s_b"))) / c2(col("n")), 6).as("rand"),
        round((col("s_ij") - lit(1.0) * col("s_a") * col("s_b") / c2(col("n")))
          / ((col("s_a") + col("s_b")) / lit(2.0)
            - lit(1.0) * col("s_a") * col("s_b") / c2(col("n"))), 6)
          .as("ari"))
  }

  /** Cohen's kappa (Cohen, Educ. Psychol. Meas. 1960): chance-
    * corrected agreement between two raters/classifiers over the same
    * row set — the scorer-agreement QA that raw percent-agreement
    * overstates whenever classes are imbalanced (two gates that both
    * say "keep" 95% of the time agree 90%+ by chance alone). Unlike
    * [[ari]], kappa is category-IDENTITY-sensitive: the raters must
    * use the same label vocabulary, and only exact la = lb cells
    * count as agreement.
    *
    * Exact ppm integers off the same contingency-table reduce as
    * [[ari]]: po = d/n (diagonal mass), pe = Σ_i row_i·col_i / n²
    * (chance agreement from the margins), and
    * kappa_ppm = (d·n − Σrc)·10⁶ div (n² − Σrc) — one truncating
    * division, no float anywhere, so the gate replays bit-for-bit.
    * Degenerate chance-perfect margins (n² = Σrc) return 0 by
    * convention. Long bound: n²·10⁶ needs n ≲ 3·10⁶ — beyond that
    * lift the three products to DECIMAL(38); the shape is unchanged.
    *
    * Scale shape: ONE map-side-combined groupBy(a,b) collapses the
    * fact to the k_a×k_b contingency table; everything after is
    * metadata-sized aggregation.
    *
    * NULL labels: a null category never equals anything (SQL
    * three-valued equality), so null-labeled rows count toward n as
    * disagreements and are excluded from the chance margins — both
    * engines agree. Coalesce to a sentinel first if "both raters
    * abstained" should count as agreement.
    */
  def cohenKappa(labels: DataFrame, aCol: String, bCol: String): DataFrame = {
    val ct = labels.groupBy(col(aCol).as("la"), col(bCol).as("lb"))
      .agg(count(lit(1)).as("nij"))
    val nd = ct.agg(sum("nij").as("n"),
      sum(when(col("la") === col("lb"), col("nij")).otherwise(lit(0L)))
        .as("d"))
    val src = ct.groupBy("la").agg(sum("nij").as("ai"))
      .join(ct.groupBy("lb").agg(sum("nij").as("bj")),
        col("la") === col("lb"))
      .agg(coalesce(sum(col("ai") * col("bj")), lit(0L)).as("src"))
    nd.crossJoin(broadcast(src))
      .select(col("n"), col("d"),
        expr("d * 1000000 div n").as("po_ppm"),
        expr("src * 1000000 div (n * n)").as("pe_ppm"),
        when(col("n") * col("n") === col("src"), lit(0L))
          .otherwise(expr("(d * n - src) * 1000000 div (n * n - src)"))
          .as("kappa_ppm"))
  }

  /** DuckDB oracle replaying `cohenKappa` op-for-op over a labels
    * subquery producing columns (la, lb).
    */
  def cohenKappaOracleSql(labelsSql: String): String =
    s"""WITH lbl AS ($labelsSql),
       |ct AS (SELECT la, lb, CAST(COUNT(*) AS BIGINT) AS nij
       |       FROM lbl GROUP BY 1, 2),
       |nd AS (SELECT CAST(SUM(nij) AS BIGINT) AS n,
       |         CAST(SUM(CASE WHEN la = lb THEN nij ELSE 0 END)
       |              AS BIGINT) AS d
       |       FROM ct),
       |src AS (SELECT CAST(COALESCE(SUM(ai * bj), 0) AS BIGINT) AS src
       |        FROM (SELECT la, SUM(nij) AS ai FROM ct GROUP BY 1) r
       |        JOIN (SELECT lb, SUM(nij) AS bj FROM ct GROUP BY 1) c
       |          ON r.la = c.lb)
       |SELECT n, d,
       |       d * 1000000 // n AS po_ppm,
       |       src * 1000000 // (n * n) AS pe_ppm,
       |       CASE WHEN n * n = src THEN 0
       |            ELSE (d * n - src) * 1000000 // (n * n - src)
       |       END AS kappa_ppm
       |FROM nd CROSS JOIN src""".stripMargin

  /** DuckDB oracle replaying `ari` op-for-op over a labels subquery
    * producing columns (la, lb).
    */
  def ariOracleSql(labelsSql: String): String =
    s"""WITH lbl AS ($labelsSql),
       |ct AS (SELECT la, lb, CAST(COUNT(*) AS BIGINT) AS nij
       |       FROM lbl GROUP BY 1, 2),
       |sij AS (SELECT CAST(SUM(nij * (nij - 1) / 2) AS BIGINT) AS s_ij,
       |               CAST(SUM(nij) AS BIGINT) AS n FROM ct),
       |sa AS (SELECT CAST(SUM(ai * (ai - 1) / 2) AS BIGINT) AS s_a,
       |              CAST(COUNT(*) AS BIGINT) AS k_a
       |       FROM (SELECT la, SUM(nij) AS ai FROM ct GROUP BY 1)),
       |sb AS (SELECT CAST(SUM(bj * (bj - 1) / 2) AS BIGINT) AS s_b,
       |              CAST(COUNT(*) AS BIGINT) AS k_b
       |       FROM (SELECT lb, SUM(nij) AS bj FROM ct GROUP BY 1))
       |SELECT n, k_a, k_b,
       |       ROUND((1.0 * (CAST(n * (n - 1) / 2 AS BIGINT) + 2 * s_ij
       |                     - s_a - s_b))
       |             / CAST(n * (n - 1) / 2 AS BIGINT), 6) AS rand,
       |       ROUND((s_ij - 1.0 * s_a * s_b / CAST(n * (n - 1) / 2 AS BIGINT))
       |             / ((s_a + s_b) / 2.0
       |                - 1.0 * s_a * s_b / CAST(n * (n - 1) / 2 AS BIGINT)),
       |             6) AS ari
       |FROM sij CROSS JOIN sa CROSS JOIN sb""".stripMargin
}
