package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column

/** 2-D skyline (Pareto frontier) per group — the multi-criteria
  * selection primitive (Börzsönyi et al., ICDE'01 "The Skyline
  * Operator"): keep the points no other point dominates, where
  * dominating means ≥ in the maximized dimension and ≤ in the
  * minimized one with at least one strict. The curation read:
  * "which documents sit on the quality-vs-cost frontier" — the
  * candidates every budget-constrained selection policy draws from,
  * regardless of how the two objectives are later weighted.
  *
  * Scale shape (the reason this beats the textbook block-nested-loop
  * skyline, which is all-pairs): the fact folds ONCE to the distinct
  * (group, x, y) point table (map-side-combined agg — the only
  * fact-sized work); the frontier itself is a per-(group, x) argmin
  * plus ONE running-min window over the distinct-x METADATA table,
  * exploiting the 2-D total order: after reducing to the best
  * (lowest-y) point at each x, a point is dominated iff some
  * strictly-larger x achieved y ≤ its y — exactly a running min over
  * x descending. No pairwise comparison ever materializes; the
  * window sorts the point table, never the fact. All arithmetic is
  * exact integers, so the frontier replays bit-for-bit cross-engine.
  *
  * Ties: equal (x, y) points do not dominate each other (no strict
  * dimension) — all rows at a frontier point are reported via
  * `n_rows`. Within one x, only the min-y point survives (same x,
  * strictly smaller y dominates). run_min == y at a larger x
  * dominates too (x strict, y equal) — the filter is strict `>`.
  */
object Skyline {

  /** Frontier points (group, x, y, n_rows): maximize `xMax`,
    * minimize `yMin`; both must be exact integer columns.
    */
  def pareto2d(df: DataFrame, group: String, xMax: Column,
      yMin: Column): DataFrame = {
    val pts = df
      .groupBy(col(group).as("g"), xMax.cast("long").as("x"),
        yMin.cast("long").as("y"))
      .agg(count(lit(1)).as("n_rows"))
    // argmin by struct: y is unique per (g, x) row here, so the
    // struct min picks the lowest y and carries its count along —
    // one agg, no join back to the fact.
    val best = pts
      .groupBy("g", "x")
      .agg(min(struct(col("y"), col("n_rows"))).as("m"))
      .select(col("g"), col("x"), col("m.y").as("y"),
        col("m.n_rows").as("n_rows"))
    val w = Window.partitionBy("g").orderBy(col("x").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    best
      .withColumn("run_min", min("y").over(w))
      .filter(col("run_min").isNull || col("run_min") > col("y"))
      .select("g", "x", "y", "n_rows")
  }

  /** DuckDB rendering of [[pareto2d]] (identical op order;
    * `srcSql` must yield columns g, x, y).
    */
  def pareto2dOracleSql(srcSql: String): String =
    s"""WITH pts AS (
       |  SELECT g, x, y, COUNT(*) AS n_rows FROM ($srcSql) GROUP BY 1, 2, 3),
       |best AS (
       |  SELECT g, x, y, n_rows FROM (
       |    SELECT g, x, y, n_rows,
       |           ROW_NUMBER() OVER (PARTITION BY g, x ORDER BY y) AS rn
       |    FROM pts) WHERE rn = 1),
       |f AS (
       |  SELECT g, x, y, n_rows,
       |         MIN(y) OVER (PARTITION BY g ORDER BY x DESC
       |                      ROWS BETWEEN UNBOUNDED PRECEDING
       |                      AND 1 PRECEDING) AS run_min
       |  FROM best)
       |SELECT g, x, y, n_rows FROM f
       |WHERE run_min IS NULL OR run_min > y""".stripMargin
}
