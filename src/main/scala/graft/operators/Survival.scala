package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Kaplan–Meier survival estimation (Kaplan & Meier '58) over user
  * activity — the CENSORING-AWARE retention curve: cohort retention
  * (q_w_cohort_retention) counts who came back per period, but "still
  * active at cutoff" users are not churners, and dropping or
  * miscounting them biases naive retention down. KM handles exactly
  * this: each user contributes a duration (first→last activity) and
  * an event flag (churned = went quiet ≥ censorGapDays before the
  * observation end; otherwise CENSORED), and the survival curve
  * multiplies per-duration hazards only over true churn events.
  *
  * Scale shape: the fact folds to one (first, last) row per user in
  * a single map-side-combined agg; everything after runs on the
  * durations-sized table (distinct duration days — periods, not
  * users): prefix-sum window for the at-risk counts, one bounded
  * collect of the factor array, map-side fold per output row. The
  * classic survival packages sort individual subjects; here subjects
  * never leave the first agg.
  *
  * Determinism: durations/counts are exact integers; each survival
  * value is a LEFT-TO-RIGHT fold of (n_risk−events)/n_risk factors
  * in duration order — every step one IEEE divide and multiply of
  * exact integers, identical in any engine (the qWSeasonality
  * fixed-order-fold convention) — rounded 6 dp.
  *
  * Output: one row per distinct duration day — (dur_days, n_risk,
  * n_events, n_censored, s_km), S non-increasing from 1.
  */
object Survival {

  def kaplanMeier(df: DataFrame, userCol: String, tsSec: Column,
      censorGapDays: Int): DataFrame =
    kaplanMeierFromExtents(userExtents(df, userCol, tsSec), censorGapDays)

  /** The per-user activity-extent aggregation of [[kaplanMeier]]:
    * (userCol, first_s, last_s). min and max are ORDER-FREE merges,
    * so the identical expression runs as an incremental stateful
    * STREAMING aggregation ([[graft.streaming.StreamSurvival]]) —
    * one tiny state row per user — and the drained state finishes to
    * the bit-exact batch curve via [[kaplanMeierFromExtents]] (the
    * StreamDrift/StreamCalibration/StreamTrend theorem).
    */
  def userExtents(df: DataFrame, userCol: String, tsSec: Column)
      : DataFrame =
    df.groupBy(userCol)
      .agg(min(tsSec).as("first_s"), max(tsSec).as("last_s"))

  /** The curve finish of [[kaplanMeier]] over a (user, first_s,
    * last_s) extent table.
    */
  def kaplanMeierFromExtents(extents: DataFrame,
      censorGapDays: Int): DataFrame = {
    require(censorGapDays >= 1, "censorGapDays must be >= 1")
    val perUser = extents
      .localCheckpoint() // users-sized; referenced twice (gmax + durs)
    val gmax = perUser.agg(max("last_s").as("gmax"))
    val durs = perUser.crossJoin(broadcast(gmax))
      .select(expr("(last_s - first_s) div 86400").as("dur_days"),
        when(col("last_s") < col("gmax") - lit(censorGapDays * 86400L), 1L)
          .otherwise(0L).as("ev"))
      .groupBy("dur_days")
      .agg(count(lit(1)).as("cnt"), sum("ev").as("n_events"))
    val wPrev = Window.orderBy("dur_days")
      .rowsBetween(Window.unboundedPreceding, -1)
    val tot = durs.agg(sum("cnt").as("n_total"))
    // at-risk = everyone whose duration reaches this day (durations-
    // sized frame: the window is over periods, never users)
    val risk = durs.crossJoin(broadcast(tot))
      .withColumn("n_risk",
        col("n_total") - coalesce(sum("cnt").over(wPrev), lit(0L)))
      .withColumn("rk", row_number().over(Window.orderBy("dur_days")))
      .localCheckpoint() // durations-sized; factor array + output rows
    // collect_list order is partition-dependent (the house rule every
    // other collect site follows): collect (dur, factor) STRUCTS and
    // array_sort — dur_days is the leading struct field and distinct,
    // so the sorted array is the duration order on any cluster, not
    // just in local mode where shuffle blocks happen to arrive in order
    val fa = risk
      .agg(array_sort(collect_list(struct(col("dur_days"),
        ((col("n_risk") - col("n_events")).cast("double")
          / col("n_risk").cast("double")).as("f")))).as("faz"))
      .select(transform(col("faz"), s => s.getField("f")).as("fa"))
    risk.crossJoin(broadcast(fa))
      .select(col("dur_days"), col("n_risk"), col("n_events"),
        (col("cnt") - col("n_events")).as("n_censored"),
        round(aggregate(slice(col("fa"), lit(1), col("rk")),
          lit(1.0), (a, x) => a * x), 6).as("s_km"))
      .orderBy("dur_days")
  }

  /** Oracle rendering (self-contained statement); srcSql yields
    * (u, sec) — user id and activity epoch seconds.
    */
  def kaplanMeierOracleSql(srcSql: String, censorGapDays: Int): String =
    s"""WITH pu AS (SELECT u, MIN(sec) AS first_s, MAX(sec) AS last_s
       |            FROM ($srcSql) GROUP BY u),
       |gm AS (SELECT MAX(last_s) AS gmax FROM pu),
       |du AS (SELECT (last_s - first_s) // 86400 AS dur_days,
       |         CASE WHEN last_s < gmax - ${censorGapDays * 86400L}
       |              THEN 1 ELSE 0 END AS ev
       |       FROM pu CROSS JOIN gm),
       |dd AS (SELECT dur_days, COUNT(*) AS cnt,
       |         CAST(SUM(ev) AS BIGINT) AS n_events
       |       FROM du GROUP BY dur_days),
       |rk AS (SELECT dur_days, cnt, n_events,
       |         CAST((SELECT SUM(cnt) FROM dd) AS BIGINT)
       |           - CAST(COALESCE(SUM(cnt) OVER (ORDER BY dur_days
       |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
       |               0) AS BIGINT) AS n_risk,
       |         ROW_NUMBER() OVER (ORDER BY dur_days) AS rn
       |       FROM dd),
       |fa AS (SELECT list(CAST(n_risk - n_events AS DOUBLE) / n_risk
       |                   ORDER BY dur_days) AS f FROM rk)
       |SELECT dur_days, n_risk, n_events,
       |       CAST(cnt - n_events AS BIGINT) AS n_censored,
       |       ROUND(list_reduce(list_prepend(1.0::DOUBLE,
       |         f[1:CAST(rn AS INT)]), (a, x) -> a * x), 6) AS s_km
       |FROM rk CROSS JOIN fa ORDER BY dur_days""".stripMargin
}
