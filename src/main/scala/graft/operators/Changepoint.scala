package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mean-shift changepoint detection by the CUSUM statistic (Page '54;
  * the max-|cumulative-deviation| rendering is the standard offline
  * single-changepoint estimator): the split point t* maximizing
  * |Σ_{i≤t} x_i · T − t · Σ x_i| — the cumulative deviation from a
  * constant-mean fit, scaled by T so everything stays EXACT integer
  * (no mean, no float: cents × day-count products bound well inside
  * long for ≤ ~10⁴ periods × ~10¹² total cents). The pipeline use is
  * source-health monitoring: "when did this feed's daily volume /
  * quality score change level?"
  *
  * Scale shape: the fact folds map-side to one row per period FIRST
  * (the only corpus-sized pass); the cumulative window, argmax, and
  * split means run over the periods-sized series — metadata, like
  * every monitor in the drift family. The single-partition window
  * over periods is deliberate and bounded by |periods| (document the
  * cadence: daily for years is ~10³ rows).
  */
object Changepoint {

  /** Top-1 mean-shift split of Σ`xCents` per `timeCol` period.
    * Output (1 row): change_at (first period of the AFTER regime is
    * change_at's successor; the split means make the direction
    * obvious), n_periods, dstat (exact |D| in cents·periods),
    * mean_before_cents, mean_after_cents (floor-div, exact).
    */
  def cusumMeanShift(df: DataFrame, timeCol: Column,
      xCents: Column): DataFrame = {
    // daily is periods-sized but consumed by BOTH the totals agg and
    // the windowed chain — pinned so the corpus-sized fold runs once
    // (the Drift.psiFromCounts lesson)
    val daily = df.groupBy(timeCol.as("t"))
      .agg(sum(xCents.cast("long")).as("x"))
      .localCheckpoint()
    val w = Window.orderBy("t")
    val tot = daily.agg(sum("x").as("total"), count(lit(1)).as("tt"))
    daily
      .withColumn("s", sum("x").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("idx", row_number().over(w).cast("long"))
      .crossJoin(broadcast(tot))
      .filter(col("idx") < col("tt")) // a split needs both sides non-empty
      .withColumn("d", abs(col("s") * col("tt") - col("idx") * col("total")))
      .orderBy(desc("d"), asc("t")).limit(1)
      .select(col("t").as("change_at"), col("tt").as("n_periods"),
        col("d").as("dstat"),
        expr("s div idx").as("mean_before_cents"),
        expr("(total - s) div (tt - idx)").as("mean_after_cents"))
  }
}
