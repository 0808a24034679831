package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column

/** CUPED — Controlled-experiment Using Pre-Experiment Data (Deng,
  * Xu, Kohavi & Walker, WSDM'13): the variance-reduction layer every
  * large experimentation platform runs before reading an A/B metric.
  * Each unit's post-period metric Y is adjusted by its own
  * pre-period covariate X: Y' = Y − θ(X − mean(X)), θ =
  * cov(X,Y)/var(X) pooled across arms. The adjustment removes the
  * between-user variance X explains (exactly ρ² of it at optimal θ)
  * without biasing the treatment contrast — arm means shift only by
  * θ·(arm's covariate imbalance), which randomization drives to 0.
  *
  * Scale shape: the fact folds ONCE to a per-user (x, y) table
  * (conditional sums on either side of the split instant — one
  * map-side-combined shuffle by user), then per-arm sufficient
  * statistics (n, Σx, Σy, Σxy, Σx², Σy²) fold that to a 2-row
  * metadata table. θ, the adjusted means, and the per-arm variance
  * ratio all come CLOSED FORM off those stats — mean(Y'_a) =
  * mean(Y_a) − θ(mean(X_a) − mean(X_pool)) and var(Y'_a) =
  * (Σy² − 2θΣxy + θ²Σx²)/n − mean'² — so no second per-row pass
  * exists anywhere. Arms come from the shared affine
  * [[Sampling.hashBucket]] family (deterministic, append-stable).
  *
  * Determinism: sufficient statistics are exact integers (cents;
  * squares/cross-products on decimal(18,0) operands); every derived
  * number is a FIXED sequence of IEEE ops on them, replayed
  * op-for-op by the oracle — the [[Stats.pearsonExact]] convention.
  */
object AbTest {

  /** Per-arm CUPED table: (arm, n_users, mean_y, mean_y_adj, theta,
    * var_y, var_y_adj) — `secCol` the event instant (epoch s),
    * `centsCol` the metric; the pre/post boundary is the midpoint of
    * the global time range (floor), pre strictly before.
    */
  def cuped(df: DataFrame, userCol: String, secCol: Column,
      centsCol: Column): DataFrame = {
    val base = df.select(col(userCol).as("u"), secCol.cast("long").as("sec"),
      centsCol.cast("long").as("cents"))
    val mid = base.agg(
      ((min("sec") + max("sec")) - pmod(min("sec") + max("sec"), lit(2L)))
        .divide(lit(2L)).cast("long").as("tmid"))
    val perUser = base.crossJoin(broadcast(mid))
      .groupBy("u")
      .agg(
        sum(when(col("sec") < col("tmid"), col("cents")).otherwise(0L))
          .as("x"),
        sum(when(col("sec") >= col("tmid"), col("cents")).otherwise(0L))
          .as("y"))
      .withColumn("arm", Sampling.hashBucket(col("u"), 2))
    val dec = (c: String) => col(c).cast("decimal(18,0)")
    val armStats = perUser.groupBy("arm")
      .agg(count(lit(1)).as("n"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(dec("x") * dec("y")).as("sxy"),
        sum(dec("x") * dec("x")).as("sxx"),
        sum(dec("y") * dec("y")).as("syy"))
    val pool = armStats.agg(
      sum("n").as("pn"), sum("sx").as("psx"), sum("sy").as("psy"),
      sum("sxy").as("psxy"), sum("sxx").as("psxx"))
    def d(c: String) = col(c).cast("double")
    val withTheta = armStats.crossJoin(broadcast(pool))
      .withColumn("theta",
        (d("pn") * d("psxy") - d("psx") * d("psy"))
          / (d("pn") * d("psxx") - d("psx") * d("psx")))
      .withColumn("mean_x_pool", d("psx") / d("pn"))
    val n = d("n")
    withTheta.select(
      col("arm"), col("n").as("n_users"),
      (d("sy") / n).as("mean_y"),
      (d("sy") / n - col("theta") * (d("sx") / n - col("mean_x_pool")))
        .as("mean_y_adj"),
      col("theta"),
      (d("syy") / n - (d("sy") / n) * (d("sy") / n)).as("var_y"),
      ((d("syy") - lit(2.0) * col("theta") * d("sxy")
        + col("theta") * col("theta") * d("sxx")) / n
        - (d("sy") / n - col("theta") * d("sx") / n)
          * (d("sy") / n - col("theta") * d("sx") / n)).as("var_y_adj"))
  }

  /** DuckDB rendering of [[cuped]]; `srcSql` must yield
    * (u, sec, cents).
    */
  def cupedOracleSql(srcSql: String): String =
    s"""WITH base AS (SELECT u, sec, cents FROM ($srcSql)),
       |mid AS (SELECT CAST((MIN(sec) + MAX(sec)
       |          - (((MIN(sec) + MAX(sec)) % 2) + 2) % 2) / 2 AS BIGINT)
       |          AS tmid FROM base),
       |pu AS (SELECT u,
       |         CAST(SUM(CASE WHEN sec < tmid THEN cents ELSE 0 END)
       |              AS BIGINT) AS x,
       |         CAST(SUM(CASE WHEN sec >= tmid THEN cents ELSE 0 END)
       |              AS BIGINT) AS y,
       |         ${Sampling.hashBucketSql("u", 2)} AS arm
       |       FROM base CROSS JOIN mid GROUP BY u),
       |st AS (SELECT arm, COUNT(*) AS n,
       |         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
       |         SUM(CAST(x AS DECIMAL(18,0)) * CAST(y AS DECIMAL(18,0)))
       |           AS sxy,
       |         SUM(CAST(x AS DECIMAL(18,0)) * CAST(x AS DECIMAL(18,0)))
       |           AS sxx,
       |         SUM(CAST(y AS DECIMAL(18,0)) * CAST(y AS DECIMAL(18,0)))
       |           AS syy
       |       FROM pu GROUP BY arm),
       |pool AS (SELECT CAST(SUM(n) AS BIGINT) AS pn,
       |           CAST(SUM(sx) AS BIGINT) AS psx,
       |           CAST(SUM(sy) AS BIGINT) AS psy,
       |           SUM(sxy) AS psxy, SUM(sxx) AS psxx FROM st),
       |t AS (SELECT st.*,
       |        (CAST(pn AS DOUBLE) * CAST(psxy AS DOUBLE)
       |         - CAST(psx AS DOUBLE) * CAST(psy AS DOUBLE))
       |        / (CAST(pn AS DOUBLE) * CAST(psxx AS DOUBLE)
       |           - CAST(psx AS DOUBLE) * CAST(psx AS DOUBLE)) AS theta,
       |        CAST(psx AS DOUBLE) / CAST(pn AS DOUBLE) AS mean_x_pool
       |      FROM st CROSS JOIN pool)
       |SELECT arm, n AS n_users,
       |       CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS mean_y,
       |       CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
       |       - theta * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)
       |                  - mean_x_pool) AS mean_y_adj,
       |       theta,
       |       CAST(syy AS DOUBLE) / CAST(n AS DOUBLE)
       |       - (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
       |         * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) AS var_y,
       |       (CAST(syy AS DOUBLE) - 2.0 * theta * CAST(sxy AS DOUBLE)
       |        + theta * theta * CAST(sxx AS DOUBLE)) / CAST(n AS DOUBLE)
       |       - (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
       |          - theta * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
       |         * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
       |            - theta * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
       |         AS var_y_adj
       |FROM t""".stripMargin
}
