package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Neighborhood-based link prediction: common-neighbor count and
  * resource-allocation score (Zhou, Lü & Zhang, Eur. Phys. J. B
  * 2009) for NON-adjacent node pairs of an undirected simple graph —
  * "which edges are missing": the candidate-edge ranker for a
  * near-dup graph (pairs the banded MinHash pass missed but the
  * neighborhood structure implies), entity-resolution transitivity
  * repair, and related-item discovery.
  *
  * Scores, both exact integers:
  *  - cn        = |Γ(u) ∩ Γ(v)| — shared-neighbor count;
  *  - ra_micros = Σ_{z ∈ Γ(u)∩Γ(v)} ⌊10⁶ / deg(z)⌋ — per-term-floored
  *    resource allocation (a shared neighbor's endorsement is diluted
  *    by its degree). Flooring per TERM keeps the sum an order-free
  *    exact integer — the house determinism convention.
  *
  * Scale shape: pairs are generated as wedges through shared
  * neighbors z — an adjacency self-join on z whose intermediate is
  * Σ deg(z)², quadratic in the hub degree (same explosion the
  * triangle counter dodges by orientation, which does NOT apply
  * here: both wedge endpoints must be kept). The published fix is
  * the hub cut: neighbors with deg(z) > maxDeg generate no wedges.
  * For RA the bias is tiny by construction (a dropped hub term is
  * < 10⁶/maxDeg); for cn it undercounts through hubs — documented
  * contract, standard in the LP literature (hubs connect everything
  * and predict nothing). The wedge intermediate is then bounded by
  * |V|·maxDeg² regardless of skew. Degree/adjacency tables are
  * edge-fold metadata; the final anti-join against the edge list
  * removes already-adjacent pairs.
  */
object LinkPrediction {

  /** (a, b, cn, ra_micros) for non-adjacent pairs with cn >= minCn,
    * wedges restricted to shared neighbors of degree <= maxDeg.
    * Self-loops dropped, parallel/reverse edges collapsed; a < b.
    */
  def commonNeighborScores(edges: DataFrame, srcCol: String,
      dstCol: String, maxDeg: Int, minCn: Int): DataFrame = {
    require(maxDeg >= 2, s"maxDeg must be >= 2, got $maxDeg")
    require(minCn >= 1, s"minCn must be >= 1, got $minCn")
    val e0 = edges
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()

    val adj = e0.select(col("u").as("z"), col("v").as("n"))
      .unionAll(e0.select(col("v").as("z"), col("u").as("n")))
    val deg = adj.groupBy("z").agg(count(lit(1)).as("d"))
    // non-hub adjacency: the wedge generator; weight carried per z
    val nad = adj
      .join(broadcast(deg.filter(col("d") <= maxDeg)), "z")
      .withColumn("w", expr("1000000 div d"))

    val pairs = nad.as("l")
      .join(nad.as("r"),
        col("l.z") === col("r.z") && col("l.n") < col("r.n"))
      .select(col("l.n").as("a"), col("r.n").as("b"), col("l.w"))
      .groupBy("a", "b")
      .agg(count(lit(1)).as("cn"), sum("w").as("ra_micros"))
      .filter(col("cn") >= minCn)

    pairs.join(e0,
        pairs("a") === e0("u") && pairs("b") === e0("v"), "left_anti")
  }

  /** DuckDB oracle replaying [[commonNeighborScores]] op-for-op over
    * an edge subquery producing (src, dst).
    */
  def commonNeighborScoresOracleSql(edgesSql: String, maxDeg: Int,
      minCn: Int): String =
    s"""WITH ein AS ($edgesSql),
       |e0 AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
       |       FROM ein WHERE src <> dst),
       |adj AS (SELECT u AS z, v AS n FROM e0
       |        UNION ALL SELECT v AS z, u AS n FROM e0),
       |deg AS (SELECT z, CAST(COUNT(*) AS BIGINT) AS d
       |        FROM adj GROUP BY 1),
       |nad AS (SELECT adj.z, adj.n, 1000000 // deg.d AS w
       |        FROM adj JOIN deg ON deg.z = adj.z
       |        WHERE deg.d <= $maxDeg),
       |pr AS (SELECT l.n AS a, r.n AS b,
       |         CAST(COUNT(*) AS BIGINT) AS cn,
       |         CAST(SUM(l.w) AS BIGINT) AS ra_micros
       |       FROM nad l JOIN nad r ON l.z = r.z AND l.n < r.n
       |       GROUP BY 1, 2
       |       HAVING COUNT(*) >= $minCn)
       |SELECT pr.a, pr.b, pr.cn, pr.ra_micros
       |FROM pr ANTI JOIN e0 ON e0.u = pr.a AND e0.v = pr.b""".stripMargin
}
