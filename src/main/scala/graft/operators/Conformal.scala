package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Split-conformal prediction intervals (Vovk et al.; Lei et al. JASA
  * 2018) in exact integer arithmetic — the distribution-free
  * uncertainty wrap for the forecast pipeline: "the model predicts
  * yhat; with probability >= 1-alpha the truth lies in yhat +- qhat",
  * with NO assumption on the model or the noise beyond exchangeability.
  *
  * Chain (all integers, replays bit-for-bit cross-engine):
  *  1. three-way deterministic split on pmod(id, 3): 0 = fit,
  *     1 = calibration, 2 = evaluation;
  *  2. predictor = per-(group, hour-of-day) truncated mean of the fit
  *     split (the seasonal-mean baseline the catalog already gates in
  *     q_w_seasonal_mean_forecast — conformal wraps ANY predictor, and
  *     an exact-integer one keeps the whole gate exact);
  *  3. calibration residuals r = |v - yhat|; qhat = the k-th smallest
  *     residual with k = ceil((n_cal + 1) * (1 - alpha)) — the finite-
  *     sample-correct order statistic. k is computed in ppm integers:
  *     k = ((n_cal + 1) * (1e6 - alphaPpm) + 999999) div 1e6;
  *  4. coverage readout on the held-out eval split: the fraction with
  *     |v - yhat| <= qhat, reported as an exact ppm ratio. The
  *     conformal theorem says its expectation is >= 1 - alpha.
  *
  * Rows whose (group, hour) never appears in the fit split are dropped
  * by the inner predictor join (no extrapolated intervals — documented
  * contract; callers wanting a fallback union a global-mean predictor
  * row in first). A group whose calibration split is too small for the
  * order statistic (k > n_cal, i.e. n_cal < (1-alpha)/alpha) drops out
  * entirely — the conformal answer there is the infinite interval,
  * which no finite qhat represents honestly.
  *
  * Scale shape: one map-side-combinable agg for the predictor
  * (group x 24 rows — metadata-sized, broadcast by AQE into both
  * residual joins); ONE per-group sort window over the calibration
  * split for the order statistic (parallelism = groups, the same shape
  * as every exact-quantile entry; at 100 TB swap stage 3 for the
  * catalog's quantile sketch and keep stages 1/2/4 unchanged — the
  * k-th-order-statistic contract is the audit twin); the eval pass is
  * map-only after its broadcast joins.
  */
object Conformal {

  /** Per-group conformal interval + held-out coverage. Input columns:
    * an integer id (split driver), a group column, an integer hour
    * column (0-23, or any bounded season key), and an exact integer
    * value column (cents/micros). Output, one row per group:
    * (group, n_cal, qhat, n_eval, n_covered, coverage_ppm).
    */
  def splitConformal(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      hourCol: String,
      valCol: String,
      alphaPpm: Long = 100000L): DataFrame = {
    require(alphaPpm > 0 && alphaPpm < 1000000L,
      s"alphaPpm must be in (0, 1e6), got $alphaPpm")
    val e = df.select(col(idCol).as("id"), col(groupCol).as("grp"),
        col(hourCol).as("hr"), col(valCol).cast("long").as("v"))
      .withColumn("split", pmod(col("id"), lit(3L)))
    // FLOOR-division group mean, spelled as (a - pmod(a, n)) div n:
    // the numerator is exactly divisible, so the truncating div
    // returns the true floor for either sign. Correction (fuzz r13):
    // DuckDB's bare `//` TRUNCATES toward zero (the r11 note claiming
    // it floors was wrong), so the ORACLE needs the same pre-adjusted
    // numerator — bare `//` over a negative non-divisible sum would
    // read one higher than this floor.
    val fit = e.filter(col("split") === 0)
      .groupBy("grp", "hr")
      .agg(expr("(sum(v) - pmod(sum(v), count(1))) div count(1)")
        .as("yhat"))
    val cal = e.filter(col("split") === 1)
      .join(fit, Seq("grp", "hr"))
      .select(col("grp"), abs(col("v") - col("yhat")).as("r"), col("id"))
    val kn = cal.groupBy("grp").agg(count(lit(1)).as("n_cal"))
      .withColumn("k",
        expr(s"((n_cal + 1) * ${1000000L - alphaPpm} + 999999) div 1000000"))
    val ranked = cal.withColumn("rn",
      row_number().over(Window.partitionBy("grp").orderBy(col("r"), col("id"))))
    val qh = ranked.join(kn, Seq("grp"))
      .filter(col("rn") === col("k"))
      .select(col("grp"), col("r").as("qhat"))
    val ev = e.filter(col("split") === 2)
      .join(fit, Seq("grp", "hr"))
      .join(qh, Seq("grp"))
      .groupBy("grp")
      .agg(count(lit(1)).as("n_eval"),
        sum(when(abs(col("v") - col("yhat")) <= col("qhat"), 1L)
          .otherwise(0L)).as("n_covered"))
    kn.select(col("grp"), col("n_cal"))
      .join(qh, Seq("grp"))
      .join(ev, Seq("grp"))
      .withColumn("coverage_ppm", expr("n_covered * 1000000 div n_eval"))
      .select("grp", "n_cal", "qhat", "n_eval", "n_covered", "coverage_ppm")
  }
}
