package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic distinct-count sketches.
  *
  * `hllEstimate` is a HyperLogLog (Flajolet et al. 2007) built from
  * scratch on deterministic polynomial hashes instead of an opaque
  * engine hash: the register state is a pure integer function of the
  * input values, so the sketch — not just its error bound — is
  * replayable in any engine (the DuckDB oracle rebuilds the identical
  * registers with plain SQL).
  *
  * Scale shape: one map-side-combining shuffle of (group, bucket, max
  * rank) — at most |groups|·m rows regardless of input size — then a
  * tiny per-group fold. Identical register state under any
  * partitioning (max is order-insensitive), asserted in SketchSpec.
  *
  * All float math is avoided until the final estimate: the harmonic
  * denominator Σ 2^(−M_j) is kept as the exact integer
  * Σ 2^(RankCap−M_j) (ranks capped at RankCap, so every term is a
  * non-negative power of two and the sum stays < 2^53 — exact in
  * BIGINT and in DOUBLE in every engine).
  */
object Sketch {
  val P1 = 1000000007L // 30-bit prime (bits 0..29 of the hash)
  val P2 = 998244353L // second prime (bits 30..59)
  val A1 = 784320987L
  val B1 = 423187231L
  val A2 = 571992343L
  val B2 = 129873211L
  val RankCap = 45 // max trailing-zero rank; 2^(45-M) stays integral

  /** 60-bit deterministic hash of an integer key: per 30-bit half, an
    * affine transform mod P then a square-affine mix ((x² mod P)·c + x
    * mod P). The square step is essential: a purely affine map is
    * near-injective on the bucket bits for consecutive keys, which
    * destroys the random-collision statistics HLL's estimator assumes
    * (observed: 200 consecutive keys → 200 distinct buckets of 256,
    * estimate 1.9× high). Every operand stays under 2^60 (x < 2^30, so
    * x² < 2^60), exact in BIGINT in any engine, for any BIGINT key.
    */
  def hash60(key: Column): Column = {
    val k = key.cast("long")
    val x1 = (pmod(k, lit(P1)) * A1 + B1) % P1
    val h1 = (x1 * x1 % P1 * 31L + x1) % P1
    val x2 = (pmod(k, lit(P2)) * A2 + B2) % P2
    val h2 = (x2 * x2 % P2 * 131L + x2) % P2
    h1 + shiftleft(h2, 30)
  }

  /** HLL rank: 1 + trailing zeros of the hash bits above the bucket
    * index (capped). ctz(r) = popcount((r & -r) - 1). Public so the
    * streaming register build (streaming/StreamSketch) shares it.
    */
  def hllRank(r: Column): Column =
    when(r === 0L, lit(RankCap))
      .otherwise(least(bit_count(r.bitwiseAND(-r) - 1) + 1, lit(RankCap)))

  /** Per-group HLL distinct estimate of `key`, m=256 registers.
    * Output: groupCols ++ (hll_est BIGINT). Exactly reproducible
    * across engines: bucket/rank/registers are integer arithmetic and
    * the final estimate is a fixed sequence of correctly-rounded IEEE
    * ops on exact inputs.
    */
  def hllEstimate(df: DataFrame, groupCols: Seq[String], key: String): DataFrame =
    hllFinish(hllRegisters(df, groupCols, key), groupCols)

  /** The register table (groupCols ++ (bucket, mj)) — the mergeable
    * state: registers of A ∪ B are the element-wise MAX of A's and
    * B's registers, which is also just the registers of the
    * concatenated rows. Split out so [[hllOverlap]] and shard-merge
    * paths build state once per side.
    *
    * `m` (power of two, default 256) is the register count — the
    * direct state-size/accuracy lever: rsd ≈ 1.04/√m, state rows ≤
    * |groups|·m. Iterative consumers whose per-round join volume is
    * |E|·occupied-registers (HyperANF) shrink m to 2⁵–2⁷; pass the
    * SAME m to [[hllFinish]] (its α constant is forked per m).
    */
  def hllRegisters(df: DataFrame, groupCols: Seq[String], key: String,
      m: Int = 256): DataFrame = {
    val shift = requirePow2(m)
    val h = hash60(col(key))
    df.select(groupCols.map(col) :+ h.bitwiseAND(m - 1).as("bucket")
        :+ hllRank(shiftright(h, shift)).as("rnk"): _*)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max("rnk").as("mj"))
  }

  /** log2(m) for a valid register count (power of two in [16, 65536] —
    * below 16 Flajolet's α table doesn't apply, above 2¹⁶ the bucket
    * bits would collide with the 60-bit hash's rank bits' headroom).
    */
  private def requirePow2(m: Int): Int = {
    require(m >= 16 && m <= 65536 && Integer.bitCount(m) == 1,
      s"HLL register count m must be a power of two in [16, 65536], got $m")
    Integer.numberOfTrailingZeros(m)
  }

  /** Flajolet's bias-correction constant α_m · m² as a Column — the
    * EXACT literal-expression spelling both engines replay (fixed
    * constants for the small-m cases, the asymptotic formula from
    * m = 128 up; Flajolet et al. 2007, Fig. 3).
    */
  def alphaM2(m: Int): Column = m match {
    case 16 => lit(0.673) * lit(256.0)
    case 32 => lit(0.697) * lit(1024.0)
    case 64 => lit(0.709) * lit(4096.0)
    case _ =>
      lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble)) *
        lit(m.toDouble * m.toDouble)
  }

  /** SQL spelling of [[alphaM2]] for oracle replay — the identical
    * literal arithmetic, so both engines round identically.
    */
  def alphaM2Sql(m: Int): String = m match {
    case 16 => "(0.673 * 256.0)"
    case 32 => "(0.697 * 1024.0)"
    case 64 => "(0.709 * 4096.0)"
    case _ => s"(0.7213 / (1.0 + 1.079 / $m.0) * ${m.toDouble * m.toDouble})"
  }

  /** Set-overlap estimate between two keyed row sets via sketch
    * mergeability: |A| and |B| from each side's registers, |A ∪ B|
    * from the element-wise max merge (one full-outer join over ≤256
    * buckets), |A ∩ B| by inclusion–exclusion on the FLOORED integer
    * estimates (clamped at 0 — IE can go negative at sketch error).
    * One scan per side; merge and finish are O(m) metadata — at
    * 100 TB each side's registers reduce map-side and 256 rows cross
    * the wire. Output (1 row): est_a, est_b, est_union, est_inter.
    */
  def hllOverlap(a: DataFrame, b: DataFrame, key: String): DataFrame = {
    val ra = hllRegisters(a, Nil, key)
    val rb = hllRegisters(b, Nil, key)
    val ru = ra.select(col("bucket"), col("mj"))
      .unionByName(rb.select(col("bucket"), col("mj")))
      .groupBy("bucket").agg(max("mj").as("mj"))
    val ea = hllFinish(ra, Nil).select(col("hll_est").as("est_a"))
    val eb = hllFinish(rb, Nil).select(col("hll_est").as("est_b"))
    val eu = hllFinish(ru, Nil).select(col("hll_est").as("est_union"))
    ea.crossJoin(broadcast(eb)).crossJoin(broadcast(eu))
      .withColumn("est_inter",
        greatest(col("est_a") + col("est_b") - col("est_union"), lit(0L)))
  }

  /** Pairwise overlap MATRIX across groups — "which source pairs
    * share content": one register table keyed by group (a single
    * scan of the data), then every (a < b) pair's union registers
    * from a bucket-equi self-join of the groups×256 metadata table,
    * finished with the house estimate and inclusion–exclusion. At
    * 100 TB the data is touched once; the pairwise work is
    * |groups|²·256 rows of metadata. Output per pair: group_a,
    * group_b, est_a, est_b, est_union, est_inter.
    */
  def hllOverlapMatrix(df: DataFrame, groupCol: String,
      key: String): DataFrame = {
    val reg = hllRegisters(df, Seq(groupCol), key)
      .withColumnRenamed(groupCol, "g")
      .localCheckpoint() // groups×256 rows; referenced three times
    val est = hllFinish(reg, Seq("g"))
    // no full outer per pair needed: a bucket absent on one side
    // contributes the other side's register alone, which the group
    // max over the OR-joined rows below captures exactly
    val pairs = reg.select(col("g").as("ga")).distinct()
      .join(reg.select(col("g").as("gb")).distinct(), col("ga") < col("gb"))
    val unionReg = pairs
      .join(reg.select(col("g"), col("bucket"), col("mj")),
        col("g") === col("ga") || col("g") === col("gb"))
      .groupBy("ga", "gb", "bucket").agg(max("mj").as("mj"))
    val eu = hllFinish(unionReg, Seq("ga", "gb"))
      .withColumnRenamed("hll_est", "est_union")
    eu
      .join(est.select(col("g").as("ga"), col("hll_est").as("est_a")), "ga")
      .join(est.select(col("g").as("gb"), col("hll_est").as("est_b")), "gb")
      .select(col("ga").as("group_a"), col("gb").as("group_b"),
        col("est_a"), col("est_b"), col("est_union"),
        greatest(col("est_a") + col("est_b") - col("est_union"), lit(0L))
          .as("est_inter"))
  }

  /** Estimate from a register table (groupCols ++ (bucket, mj)) —
    * split out so streaming state and shard-merged registers finish
    * with the identical arithmetic.
    */
  def hllFinish(reg: DataFrame, groupCols: Seq[String],
      m: Int = 256): DataFrame = {
    requirePow2(m)
    // Σ 2^(RankCap − M_j) over present buckets; absent buckets add 2^RankCap.
    val agg = reg.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("present"),
        // Column-API shiftleft only takes a literal shift; the SQL
        // ShiftLeft expression accepts a column.
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), $RankCap - mj)"))
          .as("sum_scaled"))
    val scale = math.pow(2.0, RankCap) // 2^45, exact
    val denomScaled =
      col("sum_scaled") + (lit(m.toLong) - col("present")) * lit(1L << RankCap)
    // alpha_m * m^2, written as the same literal expression the
    // oracle uses so both engines round identically at every step.
    val raw = alphaM2(m) / (denomScaled.cast("double") / lit(scale))
    val zeros = lit(m.toLong) - col("present")
    // Flajolet's small-range correction: linear counting on the count
    // of untouched registers when the raw estimate is ≤ 2.5m. (Both
    // engines evaluate ln over the identical double; the floor sits
    // far from integer boundaries at every ulp-level discrepancy that
    // a libm difference could produce.)
    val linear = lit(m.toDouble) * log(lit(m.toDouble) / zeros.cast("double"))
    agg.select(groupCols.map(col)
      :+ floor(when(raw <= m * 2.5 && zeros > 0, linear).otherwise(raw))
        .cast("long").as("hll_est"): _*)
  }

  // ----------------------------------------------------------------
  // Count-Min sketch (Cormode & Muthukrishnan 2005): fixed-size
  // frequency summary with one-sided error (est ≥ true count;
  // overshoot ≤ εN with probability 1−δ at w=⌈e/ε⌉, d=⌈ln 1/δ⌉).
  // ----------------------------------------------------------------

  /** depth (independent hash rows) and width (buckets per row). */
  val CmsD = 4
  val CmsW = 1024
  private val CmsA = Seq(633910099L, 742938285L, 950706376L, 129749723L)
  private val CmsB = Seq(362436069L, 521288629L, 88675123L, 5783321L)

  /** Row-i bucket of `key`: affine 2-universal hash mod P1, then mod
    * w. Every operand < 2⁶⁰ — exact BIGINT in any engine. (CMS needs
    * only pairwise independence, so the affine family is the textbook
    * choice here — unlike HLL above, which needs bit-level mixing.)
    */
  /** Theta-sketch set operations (Dasgupta et al. / DataSketches
    * "theta" family) on the bottom-k machinery: each side keeps its
    * k smallest order-hashes of the DISTINCT key set; θ = the k-th
    * smallest on a side at capacity, θ = P on an exhaustive side
    * (< k hashes ⇒ the side saw its whole set — DataSketches'
    * θ = 1.0). Then with θ∩ = min(θ_A, θ_B):
    *
    *   |A ∩ B| ≈ |{h ∈ sketchA ∩ sketchB : h < θ∩}| · P / θ∩
    *   |A ∪ B| ≈ (k−1) · P / θ_U   (θ_U = k-th smallest of the union)
    *
    * — the set-op family HLL registers CANNOT give exactly (HLL
    * intersection needs inclusion-exclusion, whose error compounds;
    * theta intersects the SAMPLES, so the estimate is direct and its
    * error stays relative to the intersection). Everything is the
    * bottom-k heap + integer arithmetic on ≤2k metadata rows — and
    * because the order-hash is a pure function of the key, the whole
    * estimate is deterministic and SQL-replayable, unlike a seeded
    * library sketch. Mergeable exactly like [[graft.operators
    * .Sampling.bottomKSample]] (union → bottom-k).
    *
    * Output (1 row): est_a, est_b, est_inter, est_union, and
    * jaccard_ppm = est_inter·10⁶ / est_union (0 when est_union = 0).
    */
  def thetaSetOps(a: DataFrame, b: DataFrame, key: String,
      k: Int): DataFrame = {
    import graft.operators.{Sampling, TopK}
    def sketch(df: DataFrame) = TopK.perGroup(
      df.select(col(key)).distinct()
        .withColumn("pri", Sampling.orderHash(col(key))),
      Seq.empty, Seq(col("pri")), k, rankName = "rk")
    val sa = sketch(a).select(col("pri"), col("rk")).localCheckpoint()
    val sb = sketch(b).select(col("pri"), col("rk")).localCheckpoint()
    val p = Sampling.P
    val thA = sa.agg(max("pri").as("th_a"), count(lit(1)).as("k_a"))
    val thB = sb.agg(max("pri").as("th_b"), count(lit(1)).as("k_b"))
    val thU = sa.select("pri").union(sb.select("pri")).distinct()
      .orderBy("pri").limit(k)
      .agg(count(lit(1)).as("u_cnt"), max("pri").as("th_u"))
    // effective theta per side: a sketch holding < k hashes saw its
    // WHOLE set (exhaustive), so its sampling threshold is P — NOT its
    // max hash. Using the max in the mixed regime (one side exhaustive,
    // other at capacity) both over-filters the intersection sample and
    // inflates the scale by ~(1+1/n) on the exhaustive side; standard
    // theta (DataSketches) sets theta = 1.0 ⇔ P for an exhaustive side.
    val thEffA = expr(s"CASE WHEN k_a < $k THEN ${p}L ELSE th_a END")
    val thEffB = expr(s"CASE WHEN k_b < $k THEN ${p}L ELSE th_b END")
    val inter = sa.select("pri").intersect(sb.select("pri"))
    val interCnt = inter.crossJoin(broadcast(thA)).crossJoin(broadcast(thB))
      .filter(col("pri") <= least(thEffA, thEffB))
      .agg(count(lit(1)).as("n_inter"))
    val uCnt = thU // (u_cnt, th_u)
    // a sketch holding fewer than k hashes is EXHAUSTIVE — its
    // estimate is the exact count (the standard KMV small-set path);
    // the intersection is exact only when BOTH sides are exhaustive
    val thEff = s"least(CASE WHEN k_a < $k THEN ${p}L ELSE th_a END," +
      s" CASE WHEN k_b < $k THEN ${p}L ELSE th_b END)"
    thA.crossJoin(broadcast(thB))
      .crossJoin(broadcast(uCnt)).crossJoin(broadcast(interCnt))
      .select(
        expr(s"CASE WHEN k_a < $k THEN k_a" +
          s" ELSE (k_a - 1) * $p div th_a END").as("est_a"),
        expr(s"CASE WHEN k_b < $k THEN k_b" +
          s" ELSE (k_b - 1) * $p div th_b END").as("est_b"),
        expr(s"CASE WHEN k_a < $k AND k_b < $k THEN n_inter" +
          s" ELSE n_inter * $p div $thEff END")
          .as("est_inter"),
        expr(s"CASE WHEN u_cnt < $k THEN u_cnt" +
          s" ELSE ${(k - 1).toLong * p} div th_u END").as("est_union"))
      .withColumn("jaccard_ppm",
        when(col("est_union") > 0,
          expr("est_inter * 1000000 div est_union")).otherwise(0L))
  }

  def cmsBucket(key: Column, i: Int, w: Int = CmsW): Column =
    pmod(pmod(key.cast("long"), lit(P1)) * CmsA(i) + CmsB(i), lit(P1)) % w

  /** Build the d×w sketch: ≤ d·w counter rows regardless of input
    * size, via one map-side-combining shuffle (rows explode map-side,
    * partial counts combine before the exchange). The sketch is a
    * pure integer function of the input multiset — replayable
    * cross-engine, mergeable across shards by bucket-wise SUM.
    */
  def cmsSketch(df: DataFrame, key: String,
      d: Int = CmsD, w: Int = CmsW): DataFrame =
    df.select(posexplode(array((0 until d).map(i =>
        cmsBucket(col(key), i, w)): _*)).as(Seq("i", "bucket")))
      .groupBy("i", "bucket").agg(count(lit(1)).as("c"))

  /** Point estimates for `targets(keyCol)`: min over the d counters.
    * The sketch side is ≤ d·w rows — broadcast — so the probe is
    * map-side however large the target set is. Keys the sketch never
    * saw estimate 0 via the left-join coalesce.
    */
  def cmsEstimate(sketch: DataFrame, targets: DataFrame, keyCol: String,
      d: Int = CmsD, w: Int = CmsW): DataFrame = {
    val probes = targets
      .select(col(keyCol), posexplode(array((0 until d).map(i =>
        cmsBucket(col(keyCol), i, w)): _*)).as(Seq("i", "bucket")))
    probes.join(broadcast(sketch), Seq("i", "bucket"), "left")
      .groupBy(keyCol)
      .agg(min(coalesce(col("c"), lit(0L))).as("cms_est"))
  }

  /** Oracle-SQL rendering of sketch+estimate over one table (same
    * constants and op order; DuckDB's % on positives == pmod here
    * because P1 > 0 and key-mod is wrapped non-negative).
    */
  def cmsOracleSql(table: String, key: String, targetsSql: String,
      d: Int = CmsD, w: Int = CmsW): String = {
    def bucket(i: Int, k: String) =
      s"((((($k % $P1) + $P1) % $P1) * ${CmsA(i)} + ${CmsB(i)}) % $P1) % $w"
    val rows = (0 until d).map(i =>
      s"SELECT $i AS i, ${bucket(i, key)} AS bucket FROM $table")
      .mkString("\n  UNION ALL ")
    val probes = (0 until d).map(i =>
      s"SELECT $key, $i AS i, ${bucket(i, key)} AS bucket FROM t")
      .mkString("\n  UNION ALL ")
    s"""WITH sk AS (
       |  SELECT i, bucket, COUNT(*) AS c FROM (
       |  $rows) GROUP BY i, bucket),
       |t AS ($targetsSql),
       |pr AS (
       |  $probes)
       |SELECT pr.$key, CAST(MIN(COALESCE(sk.c, 0)) AS BIGINT) AS cms_est
       |FROM pr LEFT JOIN sk USING (i, bucket)
       |GROUP BY pr.$key""".stripMargin
  }

  // ----------------------------------------------------------------
  // Mergeable grouped quantile sketch (HDR-histogram-style: Tene's
  // HdrHistogram / DDSketch-family log buckets, specialized to
  // base-2 integer arithmetic). The missing member of the sketch
  // family for 100 TB percentile dashboards: HLL answers "how many
  // distinct", CMS "how often", this answers "what value at rank q"
  // in one map-side-combining shuffle of ≤ |groups|·2^12 counter
  // rows, mergeable across shards by bucket-wise SUM.
  //
  // Why not t-digest: a t-digest's centroid state depends on merge
  // ORDER, so two runs over different partitionings produce different
  // (equally valid) sketches — unverifiable by exact compare. The
  // HDR bucket is a pure integer function of the VALUE — bit-width
  // exponent + top QSubBits mantissa bits — so the sketch state is
  // partitioning-invariant and the whole estimate replays exactly in
  // SQL (length(bin(v)) and shifts are engine-portable integer ops;
  // no libm log whose ulp could flip a bucket at a boundary).
  // Guarantee: relative error ≤ 2^(1-QSubBits) (≈3.1% at 6 sub-bits,
  // halved by midpoint interpolation), for any distribution, any
  // data size — same shape as DDSketch's γ-relative-accuracy bound.
  // Domain: positive longs (scale money to cents first; shift/offset
  // a signed domain before sketching).
  // ----------------------------------------------------------------

  /** Sub-bucket mantissa bits: bucket = (bitWidth(v), v >> (bw-6)). */
  val QSubBits = 6

  /** Build the sketch: groupCols ++ (e, sub, cnt) — at most
    * 64·2^(QSubBits-1) buckets per group regardless of input size.
    * One shuffle, partial counts combine map-side.
    */
  def quantileSketch(df: DataFrame, groupCols: Seq[String],
      value: Column): DataFrame =
    df.select(groupCols.map(col) :+ value.cast("long").as("v"): _*)
      .withColumn("e", length(bin(col("v"))).cast("int"))
      .withColumn("sub", expr(s"shiftright(v, greatest(e - $QSubBits, 0))"))
      .groupBy((groupCols :+ "e" :+ "sub").map(col): _*)
      .agg(count(lit(1)).as("cnt"))

  /** Merge shard sketches (bucket-wise sum) — associative/commutative,
    * so shards can reduce in any tree shape.
    */
  def quantileSketchMerge(sketches: DataFrame, groupCols: Seq[String]): DataFrame =
    sketches.groupBy((groupCols :+ "e" :+ "sub").map(col): _*)
      .agg(sum("cnt").as("cnt"))

  /** Quantile estimates from a sketch. `qs` are (label, num, den)
    * rational quantiles — rank = ⌈num·n/den⌉ in EXACT integer
    * arithmetic (no double q·n whose rounding could flip a rank at a
    * boundary). Output: groupCols ++ (q_label, est). The window runs
    * over the tiny sketch (≤2^11 rows per group), not the data.
    */
  def quantileEstimates(sketch: DataFrame, groupCols: Seq[String],
      qs: Seq[(String, Int, Int)]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy("e", "sub")
    // group total as a whole-partition window, NOT a self-join: both
    // windows share one exchange+sort over the tiny sketch, and a
    // sketch read back from a named view (e.g. streaming memory-sink
    // state) would hit Spark's conflicting-attribute self-join trap
    val wAll = Window.partitionBy(groupCols.map(col): _*)
    val cum = sketch
      .withColumn("cum", sum("cnt").over(w))
      .withColumn("n", sum("cnt").over(wAll))
    val qLit = array(qs.map { case (l, num, den) =>
      struct(lit(l).as("ql"), lit(num.toLong).as("num"),
        lit(den.toLong).as("den"))
    }: _*)
    cum
      .select(groupCols.map(col) :+ col("e") :+ col("sub") :+ col("cum")
        :+ col("n") :+ explode(qLit).as("q"): _*)
      // ⌈num·n/den⌉ = (num·n + den − 1) div den, all in longs
      .withColumn("rank",
        expr("(q.num * n + q.den - 1) div q.den"))
      .filter(col("cum") >= col("rank"))
      // first (e, sub) at-or-past the rank; sub < 2^QSubBits, so
      // e·64+sub orders identically to (e, sub) and min() picks it
      .groupBy(groupCols.map(col) :+ col("q.ql").as("q_label"): _*)
      .agg(min(col("e").cast("long") * 64 + col("sub")).as("bkey"))
      .withColumn("be", expr("bkey div 64").cast("int"))
      .withColumn("bs", expr(s"int(greatest(be - $QSubBits, 0))"))
      // midpoint of [sub<<s, ((sub+1)<<s)−1], integer throughout
      .withColumn("est", expr(
        "shiftleft(bkey % 64, bs) + (shiftleft(bkey % 64 + 1, bs) - 1 - shiftleft(bkey % 64, bs)) div 2"))
      .select(groupCols.map(col) :+ col("q_label") :+ col("est"): _*)
  }

  /** Oracle-SQL rendering of sketch build + estimate (same integer op
    * order; DuckDB's bin()/shifts/`//` mirror Spark's exactly).
    */
  def quantileOracleSql(table: String, groupCol: String, valueSql: String,
      qs: Seq[(String, Int, Int)]): String = {
    val qVals = qs.map { case (l, n, d) => s"('$l', $n::BIGINT, $d::BIGINT)" }
      .mkString(", ")
    s"""WITH v AS (SELECT $groupCol AS g, CAST($valueSql AS BIGINT) AS c FROM $table),
       |b AS (SELECT g, length(bin(c)) AS e,
       |             c >> (CASE WHEN length(bin(c)) > $QSubBits
       |                        THEN length(bin(c)) - $QSubBits ELSE 0 END) AS sub
       |      FROM v),
       |sk AS (SELECT g, e, sub, COUNT(*) AS cnt FROM b GROUP BY g, e, sub),
       |cum AS (SELECT g, e, sub, cnt,
       |               SUM(cnt) OVER (PARTITION BY g ORDER BY e, sub) AS cum
       |        FROM sk),
       |tot AS (SELECT g, SUM(cnt) AS n FROM sk GROUP BY g),
       |qq AS (SELECT * FROM (VALUES $qVals) t(ql, num, den)),
       |sel AS (SELECT g, ql, MIN(e * 64 + sub) AS bkey
       |        FROM cum JOIN tot USING (g) CROSS JOIN qq
       |        WHERE cum >= (num * n + den - 1) // den
       |        GROUP BY g, ql),
       |fin AS (SELECT g, ql, bkey // 64 AS e, bkey % 64 AS sub,
       |               CASE WHEN bkey // 64 > $QSubBits
       |                    THEN bkey // 64 - $QSubBits ELSE 0 END AS s
       |        FROM sel)
       |SELECT g AS $groupCol, ql AS q_label,
       |       CAST((sub << s) + ((((sub + 1) << s) - 1 - (sub << s)) // 2)
       |            AS BIGINT) AS est
       |FROM fin""".stripMargin
  }

  /** The oracle-SQL rendering of `hllEstimate` (same constants, same
    * op order) — kept next to the Scala so they evolve together.
    */
  def hllOracleSql(table: String, groupCol: String, key: String): String =
    s"""WITH x AS (SELECT $groupCol AS g,
       |  (($key % $P1) * $A1 + $B1) % $P1 AS x1,
       |  (($key % $P2) * $A2 + $B2) % $P2 AS x2 FROM $table),
       |h AS (SELECT g,
       |  ((x1 * x1 % $P1 * 31 + x1) % $P1)
       |  + (((x2 * x2 % $P2 * 131 + x2) % $P2) << 30) AS h FROM x),
       |b AS (SELECT g, h & 255 AS bucket,
       |  CASE WHEN (h >> 8) = 0 THEN $RankCap
       |       ELSE least(bit_count(((h >> 8) & -(h >> 8)) - 1) + 1, $RankCap)
       |  END AS rnk FROM h),
       |reg AS (SELECT g, bucket, MAX(rnk) AS mj FROM b GROUP BY g, bucket),
       |agg AS (SELECT g, COUNT(*) AS present,
       |        CAST(SUM(1::BIGINT << ($RankCap - mj)) AS BIGINT) AS sum_scaled
       |        FROM reg GROUP BY g),
       |est AS (SELECT g, 256 - present AS zeros,
       |  (0.7213 / (1.0 + 1.079 / 256.0) * 65536.0)
       |    / (CAST(sum_scaled + (256 - present) * (1::BIGINT << $RankCap) AS DOUBLE)
       |       / ${1L << RankCap}.0) AS raw
       |  FROM agg)
       |SELECT g AS $groupCol,
       |  CAST(floor(CASE WHEN raw <= 640.0 AND zeros > 0
       |                  THEN 256.0 * ln(256.0 / CAST(zeros AS DOUBLE))
       |                  ELSE raw END) AS BIGINT) AS hll_est
       |FROM est""".stripMargin
}
