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
        // zero pre-period variance -> no adjustment (theta 0), not a
        // 0/0 NaN that poisons every downstream column
        when(d("pn") * d("psxx") - d("psx") * d("psx") > 0.0,
          (d("pn") * d("psxy") - d("psx") * d("psy"))
            / (d("pn") * d("psxx") - d("psx") * d("psx")))
          .otherwise(lit(0.0)))
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

  /** Stratified ATT by exact subclassification (Cochran '68;
    * Rosenbaum & Rubin '84) — the observational sibling of [[cuped]]:
    * when arms are NOT randomized, compare treated vs control only
    * WITHIN strata of a pre-treatment covariate and reweight the
    * per-stratum contrasts by the TREATED stratum distribution (the
    * ATT weights — equivalently IPW with the exact-cell propensity
    * n_t(c)/(n_t(c)+n_c(c))). Here the covariate is pre-period
    * activity count (the engagement confounder) cut into `strata`
    * RANGE-RELATIVE buckets — stratum = ⌊pre_n·strata/(max_pre+1)⌋ —
    * so the cut adapts to corpus density instead of hard-coding
    * thresholds that degenerate to one bucket at 10× the data (pure
    * integer arithmetic, one broadcast max). Outcome: post-period
    * cents sum; arms: the shared affine [[Sampling.hashBucket]]
    * family.
    *
    * Common-support contract: strata with an empty arm are DROPPED
    * (no contrast exists there); consumers read n_treat per stratum
    * to see what survived. Output: one row per supported stratum
    * (n_treat, n_ctrl, per-arm micros means, cell ATT) with the
    * pooled att_micros stamped as a constant column.
    *
    * Determinism: per-user fold and cell sums are exact longs; every
    * mean is the house pre-adjusted floor division (numerator minus
    * its true mod, so trunc-div and floor-div agree — exact on
    * NEGATIVE cell contrasts too). Micros headroom: cell cents sums
    * must stay under ~9.2e12 (the ×10⁶ long bound) — at larger
    * scale lift the numerators to decimal(38,0).
    *
    * Scale shape: ONE fact fold to per-user rows (map-side-combined
    * shuffle by user), one fold to the ≤(maxStratum+1)-row cell
    * table; all estimator algebra is metadata arithmetic.
    */
  def stratifiedAtt(df: DataFrame, userCol: String, secCol: Column,
      centsCol: Column, strata: Int = 4): DataFrame = {
    require(strata >= 2, s"strata must be >= 2, got $strata")
    val base = df.select(col(userCol).as("u"),
      secCol.cast("long").as("sec"), centsCol.cast("long").as("cents"))
    val mid = base.agg(
      ((min("sec") + max("sec")) - pmod(min("sec") + max("sec"), lit(2L)))
        .divide(lit(2L)).cast("long").as("tmid"))
    val perUser0 = base.crossJoin(broadcast(mid))
      .groupBy("u")
      .agg(
        sum(when(col("sec") < col("tmid"), 1L).otherwise(0L)).as("pre_n"),
        sum(when(col("sec") >= col("tmid"), col("cents")).otherwise(0L))
          .as("y"))
      .withColumn("arm", Sampling.hashBucket(col("u"), 2))
    val mx = perUser0.agg(max("pre_n").as("mp"))
    val perUser = perUser0.crossJoin(broadcast(mx))
      .withColumn("stratum",
        expr(s"pre_n * $strata div (mp + 1)"))
    def fdiv(numer: String, den: String) =
      expr(s"(($numer) - ((($numer) % ($den)) + ($den)) % ($den)) div ($den)")
    val cells = perUser.groupBy("stratum")
      .agg(
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_treat"),
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_ctrl"),
        sum(when(col("arm") === 1, col("y")).otherwise(0L)).as("syt"),
        sum(when(col("arm") === 0, col("y")).otherwise(0L)).as("syc"))
      .filter(col("n_treat") > 0 && col("n_ctrl") > 0)
      .withColumn("mean_t_micros", fdiv("syt * 1000000", "n_treat"))
      .withColumn("mean_c_micros", fdiv("syc * 1000000", "n_ctrl"))
      .withColumn("cell_att_micros",
        col("mean_t_micros") - col("mean_c_micros"))
    val att = cells.agg(
      sum(col("n_treat") * col("cell_att_micros")).as("wsum"),
      sum("n_treat").as("wn"))
      .select(fdiv("wsum", "wn").as("att_micros"))
    cells.crossJoin(broadcast(att))
      .select(col("stratum"), col("n_treat"), col("n_ctrl"),
        col("mean_t_micros"), col("mean_c_micros"),
        col("cell_att_micros"), col("att_micros"))
  }

  /** Difference-in-differences (the canonical parallel-trends
    * readout): (post − pre) for the treated arm minus (post − pre)
    * for control — removes both the fixed between-arm level gap and
    * the common time trend, the workhorse when randomization is
    * doubtful but both arms were observed across the same boundary.
    * Same fold as [[cuped]] (per-user pre/post cents around the
    * global midpoint, arms from the shared hash family); all four
    * cell means are house-floored micros and the DiD contrast is
    * exact integer arithmetic on them. One row out.
    */
  def diffInDiff(df: DataFrame, userCol: String, secCol: Column,
      centsCol: Column): DataFrame = {
    val base = df.select(col(userCol).as("u"),
      secCol.cast("long").as("sec"), centsCol.cast("long").as("cents"))
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
    def fdiv(numer: String, den: String) =
      expr(s"(($numer) - ((($numer) % ($den)) + ($den)) % ($den)) div ($den)")
    val cells = perUser.groupBy("arm")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"))
      .withColumn("pre_micros", fdiv("sx * 1000000", "n"))
      .withColumn("post_micros", fdiv("sy * 1000000", "n"))
    cells.filter(col("arm") === 0)
      .select(col("n").as("n_ctrl"), col("pre_micros").as("pre_c"),
        col("post_micros").as("post_c"))
      .crossJoin(cells.filter(col("arm") === 1)
        .select(col("n").as("n_treat"), col("pre_micros").as("pre_t"),
          col("post_micros").as("post_t")))
      .select(col("n_ctrl"), col("n_treat"), col("pre_c"),
        col("post_c"), col("pre_t"), col("post_t"),
        ((col("post_t") - col("pre_t")) - (col("post_c") - col("pre_c")))
          .as("did_micros"))
  }

  /** DuckDB rendering of [[diffInDiff]]; `srcSql` must yield
    * (u, sec, cents).
    */
  def diffInDiffOracleSql(srcSql: String): String =
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
       |c AS (SELECT arm, CAST(COUNT(*) AS BIGINT) AS n,
       |        CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy
       |      FROM pu GROUP BY arm),
       |m AS (SELECT arm, n,
       |        (sx * 1000000 - ((sx * 1000000 % n) + n) % n) // n
       |          AS pre_micros,
       |        (sy * 1000000 - ((sy * 1000000 % n) + n) % n) // n
       |          AS post_micros
       |      FROM c)
       |SELECT c0.n AS n_ctrl, c1.n AS n_treat,
       |       c0.pre_micros AS pre_c, c0.post_micros AS post_c,
       |       c1.pre_micros AS pre_t, c1.post_micros AS post_t,
       |       (c1.post_micros - c1.pre_micros)
       |         - (c0.post_micros - c0.pre_micros) AS did_micros
       |FROM m c0 CROSS JOIN m c1
       |WHERE c0.arm = 0 AND c1.arm = 1""".stripMargin

  /** Two-sided group-sequential critical values for K equally-spaced
    * looks at α = 0.05 (Jennison & Turnbull, Group Sequential
    * Methods, Tables 2.1/2.3): Pocock's constant boundary and the
    * O'Brien–Fleming final-look constant (the OBF boundary at look k
    * is c·√(K/k)). Fixed published literals — no distribution code.
    */
  val PocockC = Map(2 -> 2.178, 3 -> 2.289, 4 -> 2.361, 5 -> 2.413)
  val ObfC = Map(2 -> 1.977, 3 -> 2.004, 4 -> 2.024, 5 -> 2.040)

  /** Group-sequential looks over an A/B metric — the peeking guard:
    * reading an experiment K times at a fixed z=1.96 inflates false
    * positives several-fold; the sequential boundaries (Pocock
    * constant, O'Brien–Fleming conservative-early) are what let a
    * platform stop early HONESTLY. Look k sees events up to
    * lo + ⌊(hi−lo)·k/K⌋; units are the fixed user population
    * (intention-to-treat: a user with no events yet contributes 0),
    * arms the shared affine [[Sampling.hashBucket]] family.
    *
    * Per look and arm the fold keeps exact (n, Σy, Σy²) — the
    * per-user cumulative sums come from ONE user fold with K
    * conditional columns (no fact×K explode), unpivoted on the
    * users-sized table. z is the standard two-sample statistic on
    * sample variances, a fixed IEEE sequence off the exact integers
    * (the pearsonExact convention), rounded 6 dp; boundary crossing
    * compares against the published literals. NULL z when either
    * arm is degenerate (n < 2 or zero variance).
    *
    * Scale shape: one map-side-combined fact fold by user, one
    * users-sized unpivot, a 2K-row stats table; everything after is
    * metadata arithmetic.
    */
  def sequentialLooks(df: DataFrame, userCol: String, secCol: Column,
      centsCol: Column, looks: Int = 4): DataFrame = {
    require(PocockC.contains(looks),
      s"looks must be in ${PocockC.keys.toSeq.sorted}, got $looks")
    val base = df.select(col(userCol).as("u"),
      secCol.cast("long").as("sec"), centsCol.cast("long").as("cents"))
    val span = base.agg(min("sec").as("lo"), max("sec").as("hi"))
    val yCols = (1 to looks).map { k =>
      sum(when(col("sec") <=
          col("lo") + expr(s"(hi - lo) * $k div $looks"),
        col("cents")).otherwise(0L)).as(s"y$k")
    }
    val perUser = base.crossJoin(broadcast(span))
      .groupBy("u")
      .agg(yCols.head, yCols.tail: _*)
      .withColumn("arm", Sampling.hashBucket(col("u"), 2))
    val long = perUser.select(col("u"), col("arm"),
      expr(s"stack($looks, ${(1 to looks)
        .map(k => s"$k, y$k").mkString(", ")}) AS (look, y)"))
    val dec = (c: String) => col(c).cast("decimal(38,0)")
    val st = long.groupBy("look", "arm")
      .agg(count(lit(1)).as("n"), sum("y").as("sy"),
        sum(dec("y") * dec("y")).as("syy"))
    val wide = st.filter(col("arm") === 0)
      .select(col("look"), col("n").as("n0"), col("sy").as("sy0"),
        col("syy").as("syy0"))
      .join(st.filter(col("arm") === 1)
        .select(col("look"), col("n").as("n1"), col("sy").as("sy1"),
          col("syy").as("syy1")), "look")
    def d(c: String) = col(c).cast("double")
    def mean(sy: String, n: String) = d(sy) / d(n)
    // sample variance: (Σy² − n·mean²) / (n−1)
    def sv(syy: String, sy: String, n: String) =
      (d(syy) - d(n) * mean(sy, n) * mean(sy, n)) / (d(n) - 1.0)
    val varsum = sv("syy1", "sy1", "n1") / d("n1") +
      sv("syy0", "sy0", "n0") / d("n0")
    val z0 = (mean("sy1", "n1") - mean("sy0", "n0")) / sqrt(varsum)
    val pc = PocockC(looks)
    val obf = ObfC(looks)
    wide.select(col("look"), col("n0"), col("n1"),
        (Stats.fdivExact(col("sy1") * 1000000L, col("n1"))
          - Stats.fdivExact(col("sy0") * 1000000L, col("n0")))
          .as("diff_micros"),
        // zero-variance guard: a dead metric must read NULL, not a
        // NaN that compares above every boundary
        when(col("n0") > 1 && col("n1") > 1 && varsum > 0.0,
          round(z0, 6)).as("z"))
      .withColumn("pocock_cross", abs(col("z")) > pc)
      .withColumn("obf_cross",
        abs(col("z")) > round(lit(obf)
          * sqrt(lit(looks.toDouble) / col("look").cast("double")), 6))
  }

  /** DuckDB rendering of [[sequentialLooks]]; `srcSql` must yield
    * (u, sec, cents).
    */
  def sequentialLooksOracleSql(srcSql: String, looks: Int = 4): String = {
    val pc = PocockC(looks)
    val obf = ObfC(looks)
    val yCols = (1 to looks).map { k =>
      s"""CAST(SUM(CASE WHEN sec <= lo + (hi - lo) * $k // $looks
         |    THEN cents ELSE 0 END) AS BIGINT) AS y$k""".stripMargin
    }.mkString(",\n")
    val unp = (1 to looks)
      .map(k => s"SELECT u, arm, $k AS look, y$k AS y FROM pu")
      .mkString("\nUNION ALL ")
    s"""WITH base AS (SELECT u, sec, cents FROM ($srcSql)),
       |span AS (SELECT MIN(sec) AS lo, MAX(sec) AS hi FROM base),
       |pu AS (SELECT u, ${Sampling.hashBucketSql("u", 2)} AS arm,
       |$yCols
       |       FROM base CROSS JOIN span GROUP BY u),
       |lg AS ($unp),
       |st AS (SELECT look, arm, CAST(COUNT(*) AS BIGINT) AS n,
       |         CAST(SUM(y) AS BIGINT) AS sy,
       |         SUM(CAST(y AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0)))
       |           AS syy
       |       FROM lg GROUP BY 1, 2),
       |w AS (SELECT a.look, a.n AS n0, a.sy AS sy0, a.syy AS syy0,
       |        b.n AS n1, b.sy AS sy1, b.syy AS syy1
       |      FROM st a JOIN st b ON b.look = a.look
       |      WHERE a.arm = 0 AND b.arm = 1),
       |zt AS (SELECT look, n0, n1, diff_micros,
       |        CASE WHEN n0 > 1 AND n1 > 1 AND vs > 0
       |          THEN ROUND(md / sqrt(vs), 6) END AS z
       |      FROM (SELECT look, n0, n1,
       |        (sy1 * 1000000 - ((sy1 * 1000000 % n1) + n1) % n1) // n1
       |        - (sy0 * 1000000 - ((sy0 * 1000000 % n0) + n0) % n0) // n0
       |          AS diff_micros,
       |        CAST(sy1 AS DOUBLE) / n1 - CAST(sy0 AS DOUBLE) / n0 AS md,
       |        ((CAST(syy1 AS DOUBLE) - CAST(n1 AS DOUBLE)
       |          * (CAST(sy1 AS DOUBLE) / n1)
       |          * (CAST(sy1 AS DOUBLE) / n1)) / (CAST(n1 AS DOUBLE) - 1.0))
       |          / CAST(n1 AS DOUBLE)
       |        + ((CAST(syy0 AS DOUBLE) - CAST(n0 AS DOUBLE)
       |          * (CAST(sy0 AS DOUBLE) / n0)
       |          * (CAST(sy0 AS DOUBLE) / n0)) / (CAST(n0 AS DOUBLE) - 1.0))
       |          / CAST(n0 AS DOUBLE) AS vs
       |        FROM w))
       |SELECT look, n0, n1, diff_micros, z,
       |       abs(z) > $pc AS pocock_cross,
       |       abs(z) > ROUND($obf * sqrt($looks.0
       |         / CAST(look AS DOUBLE)), 6) AS obf_cross
       |FROM zt""".stripMargin
  }

  /** DuckDB rendering of [[stratifiedAtt]]; `srcSql` must yield
    * (u, sec, cents).
    */
  def stratifiedAttOracleSql(srcSql: String, strata: Int = 4): String =
    s"""WITH base AS (SELECT u, sec, cents FROM ($srcSql)),
       |mid AS (SELECT CAST((MIN(sec) + MAX(sec)
       |          - (((MIN(sec) + MAX(sec)) % 2) + 2) % 2) / 2 AS BIGINT)
       |          AS tmid FROM base),
       |pu AS (SELECT u,
       |         CAST(SUM(CASE WHEN sec < tmid THEN 1 ELSE 0 END)
       |              AS BIGINT) AS pre_n,
       |         CAST(SUM(CASE WHEN sec >= tmid THEN cents ELSE 0 END)
       |              AS BIGINT) AS y,
       |         ${Sampling.hashBucketSql("u", 2)} AS arm
       |       FROM base CROSS JOIN mid GROUP BY u),
       |mx AS (SELECT CAST(MAX(pre_n) AS BIGINT) AS mp FROM pu),
       |pc AS (SELECT pre_n * $strata // (mp + 1) AS stratum,
       |         CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |           AS n_treat,
       |         CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
       |           AS n_ctrl,
       |         CAST(SUM(CASE WHEN arm = 1 THEN y ELSE 0 END) AS BIGINT)
       |           AS syt,
       |         CAST(SUM(CASE WHEN arm = 0 THEN y ELSE 0 END) AS BIGINT)
       |           AS syc
       |       FROM pu CROSS JOIN mx GROUP BY 1
       |       HAVING n_treat > 0 AND n_ctrl > 0),
       |sc AS (SELECT stratum, n_treat, n_ctrl,
       |         (syt * 1000000 - ((syt * 1000000 % n_treat) + n_treat)
       |            % n_treat) // n_treat AS mean_t_micros,
       |         (syc * 1000000 - ((syc * 1000000 % n_ctrl) + n_ctrl)
       |            % n_ctrl) // n_ctrl AS mean_c_micros
       |       FROM pc),
       |sd AS (SELECT sc.*, mean_t_micros - mean_c_micros
       |         AS cell_att_micros FROM sc),
       |att AS (SELECT CAST(SUM(n_treat * cell_att_micros) AS BIGINT)
       |          AS wsum, CAST(SUM(n_treat) AS BIGINT) AS wn FROM sd),
       |fin AS (SELECT (wsum - ((wsum % wn) + wn) % wn) // wn
       |          AS att_micros FROM att)
       |SELECT stratum, n_treat, n_ctrl, mean_t_micros, mean_c_micros,
       |       cell_att_micros, att_micros
       |FROM sd CROSS JOIN fin""".stripMargin

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
       |        CASE WHEN CAST(pn AS DOUBLE) * CAST(psxx AS DOUBLE)
       |               - CAST(psx AS DOUBLE) * CAST(psx AS DOUBLE) > 0
       |        THEN (CAST(pn AS DOUBLE) * CAST(psxy AS DOUBLE)
       |         - CAST(psx AS DOUBLE) * CAST(psy AS DOUBLE))
       |        / (CAST(pn AS DOUBLE) * CAST(psxx AS DOUBLE)
       |           - CAST(psx AS DOUBLE) * CAST(psx AS DOUBLE))
       |        ELSE 0.0 END AS theta,
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
