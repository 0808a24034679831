package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy-risk profiling of a table against a quasi-identifier set —
  * the release-gate audit (Sweeney's k-anonymity, Machanavajjhala's
  * l-diversity) a training-data pipeline runs before shipping any
  * table that joins user-adjacent attributes: every row whose
  * QI-combination is shared by fewer than k rows is re-identifiable
  * by linkage, and a group whose sensitive attribute is uniform leaks
  * the attribute even at k.
  *
  * Scale shape: ONE hash aggregation on the QI columns computes both
  * group size and the per-group distinct-sensitive count (the
  * distinct rides a two-level agg — (qi, sensitive) then qi — so
  * nothing ever collects); the global k-anonymity minimum is a 1-row
  * grand agg broadcast back, the A2 min-max pattern. Output is
  * groups-sized (bounded by the QI domain product), never rows-sized.
  */
object Privacy {

  /** Per-QI-group privacy profile. Output: qiCols..., `group_n`,
    * `l_div` (distinct sensitive values in the group), `below_k`
    * (1 when group_n < k), plus the table-wide `k_anonymity`
    * (min group size) and `rows_at_risk` (rows in below-k groups)
    * stamped on every row.
    */
  def profile(df: DataFrame, qiCols: Seq[String], sensitiveCol: String,
      k: Int): DataFrame = {
    require(qiCols.nonEmpty && k >= 2, "need QI columns and k >= 2")
    val qi = qiCols.map(col)
    val perSens = df.groupBy(qi :+ col(sensitiveCol): _*)
      .agg(count(lit(1)).as("_n"))
    // groups is QI-domain-sized but consumed by both the grand agg
    // and the output join — pinned so the table-sized two-level
    // aggregation runs once
    val groups = perSens.groupBy(qi: _*)
      .agg(sum("_n").as("group_n"), count(lit(1)).as("l_div"))
      .withColumn("below_k", when(col("group_n") < k, 1L).otherwise(0L))
      .localCheckpoint()
    val global = groups.agg(
      min("group_n").as("k_anonymity"),
      coalesce(sum(when(col("below_k") === 1, col("group_n"))), lit(0L))
        .as("rows_at_risk"))
    groups.crossJoin(broadcast(global))
      .orderBy(qiCols.head, qiCols.tail: _*)
  }
}
