package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling and split assignment.
  *
  * Training-data pipelines need splits and samples that are (a)
  * reproducible run-over-run, (b) independent of partitioning and
  * executor count, and (c) stable when the corpus is re-sharded or
  * appended to — a row's assignment must depend on the ROW, not on
  * where it happened to land. `df.sample()` / `rand()` give none of
  * those. Hashing the row's key gives all three: assignment is a pure
  * integer function of the key, map-only at any scale, and replayable
  * in any engine (the oracle recomputes the identical arithmetic).
  *
  * The affine hash (x·A + B mod P, P prime) is 2-universal — unbiased
  * bucket frequencies for any key set — and every operand stays below
  * 2⁶⁰ (exact BIGINT everywhere). Same family as [[Sketch.cmsBucket]],
  * different constants so a CMS row and a split never correlate.
  */
object Sampling {
  val P = 1000000007L
  private val A = 906488655L
  private val B = 217728422L

  /** Uniform bucket in [0, buckets) as a pure function of `key`. */
  def hashBucket(key: Column, buckets: Int): Column =
    pmod(pmod(key.cast("long"), lit(P)) * A + B, lit(P)) % buckets

  /** Row-level rendering of [[hashBucket]] — the identical affine
    * hash as a plain function, for operators that rank inside an
    * executor loop (streaming admission caps) rather than in a
    * Column expression. SamplingSpec asserts the two agree.
    * No overflow: ((key mod P) < 1e9+7) · A (≈9.1e8) ≈ 9.2e17 < 2^63.
    */
  def hashBucketLong(key: Long, buckets: Int): Long =
    ((key % P + P) % P * A + B) % P % buckets

  /** SQL rendering of [[hashBucket]] (DuckDB `%` is signed — wrap the
    * inner mod non-negative first, exactly like pmod).
    */
  def hashBucketSql(key: String, buckets: Int): String =
    s"(((($key % $P) + $P) % $P) * $A + $B) % $P % $buckets"

  /** Assign every row to a named split by hash bucket: `weights` are
    * integer percentages summing to ≤ 100 (e.g. train 80 / val 10 /
    * test 10); rows hash into 100 buckets and take the first split
    * whose cumulative range covers their bucket. Map-only; appending
    * new data never reassigns existing rows.
    */
  def hashSplit(df: DataFrame, key: String,
      weights: Seq[(String, Int)]): DataFrame = {
    require(weights.map(_._2).sum <= 100, "weights must sum to <= 100")
    val b = hashBucket(col(key), 100)
    val cum = weights.scanLeft(0)(_ + _._2).tail
    val expr = weights.zip(cum).foldRight(lit("rest"): Column) {
      case (((name, _), hi), acc) => when(b < hi, name).otherwise(acc)
    }
    df.withColumn("split", expr)
  }

  /** Grouped k-fold assignment — sklearn GroupKFold's leakage
    * contract by hash instead of greedy balancing: every row of the
    * same GROUP lands in the same fold, so no group can straddle a
    * train/validation boundary (the user-level / document-level
    * leakage that random row folds invite). Map-only: the group key
    * string-fingerprints (mod-P byte poly, the shared
    * TextFingerprint kernel) and affine-hashes into k folds — zero
    * shuffle, append-stable (new rows of a known group join its
    * fold), and exactly replayable in SQL. Callers with numeric
    * groups cast to string first (the fingerprint is over bytes).
    */
  def groupKFold(df: DataFrame, groupCol: String, k: Int): DataFrame = {
    require(k >= 2, s"groupKFold: k must be >= 2, got $k")
    df.withColumn("fold",
      hashBucket(graft.expressions.TextFingerprint(col(groupCol)), k))
  }

  /** Keep ~num/den of rows, deterministically: the rows whose hash
    * bucket mod `den` falls below `num`. A pure filter — pushes to the
    * scan, never shuffles, and the SAME rows survive on any cluster.
    */
  def bernoulliSample(df: DataFrame, key: String,
      num: Int, den: Int): DataFrame =
    df.filter(hashBucket(col(key), den) < num)

  /** Data-mixture sampling: per-source keep rates (source → num/den),
    * the way a pretraining mix up/down-weights corpora (e.g. books
    * 9/10, web 1/4). Still a pure map-only filter of (key, source) —
    * reweighting the mix never shuffles anything, and the surviving
    * set is reproducible and append-stable per source. Sources
    * missing from `rates` are dropped (an explicit mix is a
    * whitelist).
    */
  def mixtureSample(df: DataFrame, key: String, sourceCol: String,
      rates: Seq[(String, Int, Int)]): DataFrame = {
    require(rates.nonEmpty && rates.forall { case (_, n, d) => n >= 0 && n <= d },
      "rates must be 0 <= num <= den")
    val keep = rates.foldRight(lit(false): Column) {
      case ((src, num, den), acc) =>
        when(col(sourceCol) === src, hashBucket(col(key), den) < num)
          .otherwise(acc)
    }
    df.filter(keep)
  }

  /** Token-budget mixture planning + sampling — the pretraining-mix
    * recipe in one operator: given target mixture WEIGHTS per source
    * and a global token BUDGET, derive each source's keep rate from
    * its measured token total,
    *
    *   rate_s = min(1, budget·w_s / (Σw · T_s)),
    *
    * quantize it to num/den (den = 10⁶), and keep rows by the same
    * deterministic key-hash bernoulli as [[mixtureSample]] — so the
    * sampled corpus is reproducible, append-stable, and the rate
    * math is exactly replayable (one double product/division chain
    * on exact integer inputs, then floor — identical IEEE ops in any
    * engine, so cross-engine parity holds at ANY magnitude; the rate
    * equals the exact rational only while den·budget·w stays under
    * 2⁵³ ≈ budgets of 9·10⁹·w tokens — past that the double rounds,
    * shifting the keep rate by ≤1 ulp, immaterial for sampling).
    * Sources without a weight are dropped (a mix is a whitelist); a
    * source whose T_s ≤ its share keeps everything (rate saturates
    * at 1) — the budget is a target, hit exactly in expectation only
    * when every source is downsampled.
    *
    * Scale shape: one map-side-combining token-total agg; the rate
    * table is |sources| rows and broadcasts back; the sample itself
    * is a map-only filter. The corpus never shuffles.
    */
  def tokenBudgetSample(df: DataFrame, key: String, sourceCol: String,
      tokens: org.apache.spark.sql.Column, weights: Seq[(String, Int)],
      budget: Long, den: Int = 1000000): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      "weights must be positive")
    val sumW = weights.map(_._2.toLong).sum
    val spark = df.sparkSession
    import spark.implicits._
    val wDf = weights.toDF(sourceCol, "w")
    // t_s = 0 guard (degenerate source whose docs all tokenize empty):
    // unguarded, the rate is budget·w/0 = +Inf and the non-ANSI
    // long cast turns it into Long.MaxValue (silent keep-all) while
    // an ANSI engine errors on CAST(inf) — drop such sources instead
    // (nothing to sample; mirrored by `HAVING t_s > 0` in the oracle)
    val totals = df.groupBy(sourceCol)
      .agg(sum(tokens.cast("long")).as("t_s"))
      .filter(col("t_s") > 0)
    val rates = totals.join(broadcast(wDf), Seq(sourceCol))
      .withColumn("num", least(lit(den.toLong),
        floor((lit(den.toDouble) * lit(budget.toDouble) * col("w"))
          / (lit(sumW.toDouble) * col("t_s"))).cast("long")))
      .select(sourceCol, "num")
    df.join(broadcast(rates), Seq(sourceCol))
      .filter(hashBucket(col(key), den) < col("num"))
      .drop("num")
  }

  /** Temperature-flattened source mixture — the multilingual sampling
    * rule of Lample & Conneau (NeurIPS'19 §3.1; mT5/XLM-R use it
    * verbatim): draw ~`target` rows whose source shares follow
    * p_s^(1/T) renormalized, flattening head sources and upweighting
    * the tail so small corpora aren't drowned. T is FIXED at 2 — the
    * sqrt flattening — because sqrt is a correctly-rounded IEEE op
    * (bit-identical in every engine) while pow(x, 1/T) is not; an
    * engine-portable arbitrary-T needs fixed-point pow, not worth it
    * when T=2 is the published default regime.
    *
    * Share math, all order-free: sqrt(n_s) is fixed-pointed to MICROS
    * (one sqrt per SOURCE, floor — deterministic), Z = Σ_s micros is
    * an exact LONG sum, and
    *
    *   rate_s = min(1, target·sqrtm_s / (Z · n_s))
    *
    * quantized to num/den like [[tokenBudgetSample]] (same IEEE
    * product/division chain contract: parity at any magnitude,
    * exactness below 2⁵³). Rows keep by the deterministic key-hash
    * bernoulli — reproducible, append-stable per source.
    *
    * Scale shape: one map-side-combining count agg (|sources| rows),
    * a 1-row Z agg stamped back by broadcast cross join, the rate
    * table broadcast to a map-only filter. The corpus never shuffles.
    */
  def temperatureSample(df: DataFrame, key: String, sourceCol: String,
      target: Long, den: Int = 1000000): DataFrame = {
    require(target > 0, s"target must be positive, got $target")
    val sq = df.groupBy(sourceCol)
      .agg(count(lit(1)).as("n_s"))
      .withColumn("sm",
        floor(sqrt(col("n_s").cast("double")) * 1e6).cast("long"))
    val z = sq.agg(sum("sm").as("z"))
    val rates = sq.crossJoin(broadcast(z))
      .withColumn("num", least(lit(den.toLong),
        floor((lit(den.toDouble) * lit(target.toDouble) * col("sm"))
          / (col("z").cast("double") * col("n_s").cast("double")))
          .cast("long")))
      .select(sourceCol, "num")
    df.join(broadcast(rates), Seq(sourceCol))
      .filter(hashBucket(col(key), den) < col("num"))
      .drop("num")
  }

  /** Max epochs [[epochRepeat]] supports — the hash-mix stride. */
  val MaxEpochs = 16

  /** Epoch-repeat mixture — the data-constrained regime (Muennighoff
    * et al. '23: repeating high-quality sources up to ~4 epochs is
    * near-fresh-data; returns decay after): emit each row
    * `repeats(source)` times tagged 1..n with its epoch, plus a
    * deterministic global training-order key (affine hash of
    * key·stride+epoch) so the cross-source interleave is reproducible
    * and shard boundaries cut by range — the two copies of a doc land
    * FAR APART in training order, which is the point of epoching
    * rather than naive concatenation. Sources without a factor drop
    * (a mix is a whitelist, like [[mixtureSample]]).
    *
    * Map-only: broadcast factor table, explode(sequence) per row, no
    * shuffle at any scale; the writer's ORDER BY order_key is the
    * training shuffle.
    */
  def epochRepeat(df: DataFrame, key: String, sourceCol: String,
      repeats: Seq[(String, Int)]): DataFrame = {
    require(repeats.nonEmpty &&
      repeats.forall { case (_, n) => n >= 1 && n <= MaxEpochs },
      s"repeat factors must be in [1, $MaxEpochs]")
    val spark = df.sparkSession
    import spark.implicits._
    val rDf = repeats.toDF(sourceCol, "__epochs")
    df.join(broadcast(rDf), Seq(sourceCol))
      .withColumn("epoch", explode(sequence(lit(1), col("__epochs"))))
      .drop("__epochs")
      .withColumn("order_key",
        hashBucket(col(key) * MaxEpochs + col("epoch"), 1000000000))
  }

  /** Per-group document cap — heavy-GROUP downsampling (cap docs per
    * DOMAIN for a web crawl, per source, per license bucket): within
    * each group keep the `cap` rows with the smallest deterministic
    * priority (affine key hash, then key as tie-break — never
    * `rand()`, so re-runs, re-shards and appends keep their picks,
    * and a new arrival evicts the current worst instead of reshuffling
    * the sample). A handful of mega-domains holding most of a crawl is
    * the norm, not the exception; capping them is how the mixture
    * stays diverse. Runs on the TopKPerGroup heap plan: per-partition
    * heaps bound each group to `cap` BEFORE the shuffle, so a 10⁸-doc
    * domain contributes `cap` rows per input partition to the
    * exchange, never its full posting.
    */
  def groupCapSample(
      df: DataFrame,
      groupCol: String,
      keyCol: String,
      cap: Int): DataFrame =
    TopK.perGroup(df, Seq(groupCol),
        Seq(hashBucket(col(keyCol), 1000000).asc, col(keyCol).asc),
        cap, rankName = "__rn")
      .drop("__rn")

  /** Priority column for weighted sampling WITHOUT replacement, after
    * Duffield–Lund–Thorup priority sampling: q = w / u with u uniform
    * in (0, 1]; the k rows with the LARGEST q are the sample
    * (inclusion probability ≈ min(1, w/τ) for the k-th priority τ —
    * heavier rows proportionally likelier).
    *
    * Chosen over Efraimidis–Spirakis u^(1/w) deliberately: ES needs a
    * transcendental (pow/ln), and libm implementations differ by ulps
    * across engines — enough to flip a selection at the k-th
    * boundary. q = w/u is two exact-input divisions: u comes from the
    * affine key hash (not `rand()` — re-runs, re-shards and appends
    * never change a row's draw), so the priority is bit-identical on
    * any engine and any partitioning.
    */
  def weightedPriority(key: Column, weight: Column): Column = {
    val u = (hashBucket(key, 1000000) + lit(1)).cast("double") / lit(1000000.0)
    weight / u
  }

  /** SQL rendering of [[weightedPriority]] (identical op order). */
  def weightedPrioritySql(keySql: String, weightSql: String): String =
    s"""$weightSql / ((${hashBucketSql(keySql, 1000000)} + 1) / 1000000.0)"""

  /** Weighted sample of k rows (heavier `weight` → more likely):
    * global TakeOrdered on the priority — no full sort materializes.
    * Ties break on the key, so the boundary row is unambiguous.
    */
  def weightedSample(df: DataFrame, key: String, weight: Column,
      k: Int): DataFrame =
    df.withColumn("priority", weightedPriority(col(key), weight))
      .orderBy(col("priority").desc, col(key))
      .limit(k)

  /** Exact-size-k deterministic uniform sample — bottom-k by hash
    * (the KMV sketch's sample face, Bar-Yossef et al. RANDOM'02): the
    * k rows whose [[orderHash]] is smallest, found by the TopK HEAP
    * plan (partial per partition → k·partitions rows exchange →
    * final), never a global sort. Properties the threshold sampler
    * (q_o10's p-fraction filter) can't give: the size is EXACTLY k,
    * and two samples MERGE (union → bottom-k again) — which also
    * makes it streamable and shard-parallel. Deterministic: re-runs
    * and re-partitions reproduce the identical sample; appends
    * displace at most the largest-hash members. Ties on the 2⁻³⁰-
    * level hash collisions break on the key itself.
    *
    * The k-th smallest hash is simultaneously the KMV distinct-count
    * ingredient: n̂ = (k−1)·P / h₍ₖ₎ — [[bottomKDistinctEstimate]]
    * prices it as an exact floor division off the same sample.
    */
  def bottomKSample(df: DataFrame, key: String, k: Int): DataFrame =
    TopK.perGroup(
      df.withColumn("pri", orderHash(col(key))),
      Seq.empty, Seq(col("pri"), col(key)), k, rankName = "sample_rank")

  /** KMV distinct-count estimate from a [[bottomKSample]] result:
    * ⌊(k−1)·P / h₍ₖ₎⌋ over the sample's largest retained hash — one
    * row, exact integer arithmetic ((k−1)·P < 2⁶³ for k ≤ 9·10⁹).
    */
  def bottomKDistinctEstimate(sample: DataFrame, k: Int): DataFrame =
    sample.agg(max("pri").as("hk"))
      .select(expr(s"${(k - 1).toLong * P} div hk").as("distinct_est"))

  /** Weighted exact-size-k sample WITHOUT replacement — Efraimidis &
    * Spirakis IPL'06, the weighted face of [[bottomKSample]]: each row
    * draws u = (orderHash(key)+1)/P ∈ (0,1] and ranks by the ES key
    * −ln(u)/w (equivalently u^{1/w} descending); the k smallest keys
    * are the sample, found on the same global TopK heap. P(selected)
    * is proportional-to-weight without replacement — the principled
    * way to bias a training-data draw by quality/length/freshness
    * while keeping exact size, determinism, and shard-mergeability.
    *
    * Determinism note: u is an exact rational rendered to double
    * identically in both engines; the ln is each engine's libm over
    * that IDENTICAL double, so a cross-libm ulp can only flip ranks
    * between keys closer than ~1e-15 relative — astronomically
    * unlikely for distinct hashes (the TF-IDF ranking convention).
    * Weights must be ≥ 1 (ln(u) ≤ 0, so w scales magnitude only).
    */
  def weightedBottomK(df: DataFrame, key: String, weight: Column,
      k: Int): DataFrame = {
    val u = (orderHash(col(key)) + 1).cast("double") / lit(P.toDouble)
    TopK.perGroup(
      df.withColumn("es_key", -log(u) / weight.cast("double")),
      Seq.empty, Seq(col("es_key"), col(key)), k,
      rankName = "sample_rank")
  }

  /** Rendezvous (highest-random-weight) shard assignment — Thaler &
    * Ravishankar ToN'98, the consistent-placement rule behind cache
    * rings and shard maps: key k goes to the shard s maximizing
    * h(k, s). THE property mod-hashing lacks: growing nShards →
    * nShards+1 moves ONLY the keys whose argmax is the new shard
    * (≈ 1/(n+1) of them) — at 100 TB, resharding relocates 1/(n+1) of
    * the data instead of (n)/(n+1) under mod. Map-only: the n scores
    * are a generated literal array per row, argmax by struct-max with
    * ties to the SMALLER shard id (max of (score, −s) — replayed by
    * the oracle's ROW_NUMBER ORDER BY score DESC, s).
    *
    * h(k, s) = affine(k·1000003 + s) over the order-hash family —
    * distinct lane per shard, all operands < 2⁶² (k pre-wrapped
    * mod P).
    */
  def rendezvousShard(key: Column, nShards: Int): Column = {
    val mixed = pmod(pmod(key.cast("long"), lit(P)) * 1000003L, lit(P))
    val best = array_max(array((0 until nShards).map { s =>
      struct(
        pmod(pmod(mixed + s, lit(P)) * A2 + B2, lit(P)).as("score"),
        lit(-s).as("negs"))
    }: _*))
    (-best.getField("negs")).cast("int")
  }

  /** SQL rendering of [[rendezvousShard]]'s per-shard score (signed-%
    * wrapped like pmod); the oracle ranks (score DESC, s ASC).
    */
  def rendezvousScoreSql(key: String, shard: String): String =
    s"((((((($key % $P) + $P) % $P) * 1000003) % $P + $shard) % $P) " +
      s"* $A2 + $B2) % $P"

  // Second affine family — intra-shard ORDER. Distinct constants from
  // the bucket family above so a row's shard and its position within
  // the shard never correlate (same rationale as the CMS split).
  private val A2 = 611953843L
  private val B2 = 387420489L

  /** Full-range order hash in [0, P): the pseudo-random sort key for
    * [[shardShuffle]]. No overflow: (key mod P) · A2 ≈ 6.2e17 < 2⁶³.
    */
  def orderHash(key: Column): Column =
    pmod(pmod(key.cast("long"), lit(P)) * A2 + B2, lit(P))

  /** SQL rendering of [[orderHash]] (signed-% wrapped like pmod). */
  def orderHashSql(key: String): String =
    s"(((($key % $P) + $P) % $P) * $A2 + $B2) % $P"

  /** Deterministic global example shuffle into `nShards` training
    * shards — the LAST step of a pretraining-data pipeline: the model
    * must see examples in an order uncorrelated with crawl/source
    * order, and every re-run of the writer must produce the identical
    * shards (resumable training, reproducible ablations). `ORDER BY
    * rand()` gives neither; a full random sort of 100 TB is also the
    * single most expensive plan there is. This shape instead:
    *
    *   shard = affine-bucket(key, nShards)      — map-only assignment
    *   pos   = row_number over (shard) by (orderHash(key), key)
    *
    * ONE shuffle (by shard — the write partitioning the sink needs
    * anyway) and a within-partition sort; no global sort ever exists.
    * Assignment is append-stable (a new doc never moves an old doc's
    * shard); positions are snapshot-scoped by definition of a global
    * shuffle — appending renumbers only the shards the new docs land
    * in. Two independent hash families so intra-shard order does not
    * replay the assignment order. At 100 TB: nShards ≈ 10⁴–10⁵ keeps
    * shards at the 1–10 GB object-store sweet spot; the sort key is
    * 8 bytes, so the within-partition sort is as cheap as sorts get.
    */
  /** Exact waterfilling token-budget allocation across sources —
    * "give each source budget ∝ its weight, capped by what it has":
    * a_i = min(cap_i, λ·w_i) with Σ a_i = B, the standard mixture
    * solve behind quality-weighted sampling plans. Solved in CLOSED
    * FORM on the sources-sized metadata table — no iteration: in
    * ascending cap/weight order, source i saturates iff
    * cap_i·(W − pw_{i−1}) ≤ (B − pc_{i−1})·w_i (saturation is
    * monotone along that order), so one window pass of prefix sums
    * decides every source, and λ = remaining budget over remaining
    * weight comes from the last saturated row. All decimal-exact;
    * unsaturated allocations floor-divide (Σ a ≤ B, each source
    * under by < 1 token — the floor is the contract). The ratio
    * ORDER uses the integer key cap·10⁹ div w (ties to source name):
    * both engines process identically, which is what the replay
    * needs. Weights must be positive.
    */
  def budgetWaterfill(
      sources: DataFrame, // (source, cap_tokens, weight_milli)
      budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    import org.apache.spark.sql.expressions.Window
    // decimal numerator: cap·10⁹ passes the long bound at 9.2e9 tokens
    val rk = expr(
      "(CAST(cap_tokens AS DECIMAL(38,0)) * 1000000000) div weight_milli")
    val w = Window.orderBy(col("rk"), col("source"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dec = "decimal(38,0)"
    val pre = sources
      .withColumn("rk", rk)
      .withColumn("pc", sum(col("cap_tokens")).over(w).cast(dec))
      .withColumn("pw", sum(col("weight_milli")).over(w).cast(dec))
      .crossJoin(broadcast(sources.agg(
        sum("cap_tokens").cast(dec).as("tc"),
        sum("weight_milli").cast(dec).as("tw"))))
      .withColumn("sat",
        col("cap_tokens").cast(dec)
          * (col("tw") - col("pw") + col("weight_milli"))
          <= (lit(budget).cast(dec) - col("pc") + col("cap_tokens"))
            * col("weight_milli"))
    val star = pre.agg(
      coalesce(max(when(col("sat"), col("pc"))), lit(0L).cast(dec))
        .as("pcs"),
      coalesce(max(when(col("sat"), col("pw"))), lit(0L).cast(dec))
        .as("pws"))
    pre.crossJoin(broadcast(star))
      .withColumn("alloc_tokens",
        when(col("sat"), col("cap_tokens"))
          .otherwise(when(col("tw") - col("pws") > 0, expr(
            """((budgetL - pcs) * weight_milli
              | - ((((budgetL - pcs) * weight_milli) % (tw - pws)
              |     + (tw - pws)) % (tw - pws))) div (tw - pws)"""
              .stripMargin.replace("budgetL", budget.toString)))
            .otherwise(lit(0L)))
          .cast("long"))
      .select(col("source"), col("cap_tokens"), col("weight_milli"),
        col("sat").as("saturated"), col("alloc_tokens"))
  }

  /** Curriculum ordering — easy→hard staged training order with a
    * deterministic shuffle INSIDE each stage (Bengio et al. ICML'09:
    * present easier examples first, but NEVER difficulty-sorted
    * outright — within a stage the order must be uncorrelated with
    * difficulty or each stage becomes its own curriculum). Stages are
    * equi-depth over the (difficulty, cnt) histogram — metadata-sized
    * for bounded-cardinality proxies (token counts, micros-bucketed
    * scores), so the threshold solve never touches the corpus twice —
    * assignment is one broadcast join, and the within-stage
    * permutation is [[orderHash]]'s affine family (seed-replayable,
    * the shardShuffle order contract). Training order =
    * (stage, pos); whole plan: one histogram fold + one map-side
    * join + one per-stage window.
    */
  def curriculumOrder(df: DataFrame, key: String, difficulty: Column,
      nStages: Int): DataFrame = {
    require(nStages > 0, s"nStages must be positive, got $nStages")
    import org.apache.spark.sql.expressions.Window
    val hist = df.select(difficulty.cast("long").as("dv"))
      .groupBy("dv").agg(count(lit(1)).as("cnt"))
    val wcum = Window.orderBy("dv")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val stages = hist
      .withColumn("cum", sum("cnt").over(wcum))
      .crossJoin(broadcast(hist.agg(sum("cnt").as("n"))))
      .withColumn("stage",
        ((col("cum") - col("cnt")) * nStages / col("n")).cast("long"))
      .select("dv", "stage")
    val w = Window.partitionBy("stage").orderBy(col("__oh"), col(key))
    df.withColumn("dv", difficulty.cast("long"))
      .join(broadcast(stages), "dv")
      .withColumn("__oh", orderHash(col(key)))
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("__oh")
  }

  def shardShuffle(df: DataFrame, key: String, nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("shard").orderBy(col("__oh"), col(key))
    df.withColumn("shard", hashBucket(col(key), nShards))
      .withColumn("__oh", orderHash(col(key)))
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("__oh")
  }

  /** Shard-level audit of a [[shardShuffle]] result: doc/token
    * balance plus an exact ORDER fingerprint —
    * Σ pos·(orderHash(key) mod 1000003)  (mod P, summed in
    * decimal(38) so shards of any size stay exact) — one swapped pair
    * anywhere flips it, so the gate pins the permutation itself, not
    * just the partition contents. Output is nShards rows: the entire
    * 100 TB write audits into a broadcast-sized table.
    */
  def shardAudit(sharded: DataFrame, key: String,
      tokens: Column): DataFrame =
    sharded
      .withColumn("__ohm", orderHash(col(key)) % 1000003L)
      .groupBy("shard")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(tokens.cast("long")).as("n_tokens"),
        pmod(sum((col("pos") * col("__ohm")).cast("decimal(38,0)")),
          lit(P).cast("decimal(38,0)")).cast("long").as("order_fp"),
        min_by(col(key), col("pos")).as("head_doc"),
        max_by(col(key), col("pos")).as("tail_doc"))

  /** Out-of-fold target encoding — the leakage-safe categorical
    * feature (Micci-Barreca, SIGKDD Expl. 2001): encode a category
    * by the TARGET mean computed over every fold EXCEPT the row's
    * own, so a row never sees its own label through the feature (the
    * target-leakage failure mode of naive mean encoding). Folds come
    * from the shared affine [[hashBucket]] family on `key` —
    * deterministic, append-stable, and consistent with
    * [[groupKFold]]'s leakage contract.
    *
    * Closed form, not k re-aggregations: enc(c, f) =
    * (S_c − S_{c,f}) / (N_c − N_{c,f}) — per-category totals minus
    * the own-fold slice, all on the (category × k)-sized sufficient-
    * stats table after ONE map-side-combined fact scan. NULL when a
    * category lives entirely in one fold (no out-of-fold evidence —
    * callers fall back to the global prior).
    *
    * Exact integers: targets quantize to cents; the micros render
    * uses the pmod floor (toward −∞ on negative sums, identical
    * cross-engine). Long capacity: |cents sum| × 10⁶ < 2⁶³ to ~$92 B
    * per category; past that the numerator moves to decimal(38)
    * unchanged in shape.
    */
  def targetEncodeOof(df: DataFrame, cat: String, key: Column,
      targetCents: Column, k: Int): DataFrame = {
    require(k >= 2, s"need k >= 2 folds, got $k")
    val cf = df
      .select(col(cat).as("cat"), hashBucket(key, k).as("fold"),
        targetCents.cast("long").as("cents"))
      .groupBy("cat", "fold")
      .agg(count(lit(1)).as("n_cf"), sum("cents").as("s_cf"))
    val c = cf.groupBy("cat")
      .agg(sum("n_cf").as("n_c"), sum("s_cf").as("s_c"))
    val num = (col("s_c") - col("s_cf")) * 1000000L
    val den = col("n_c") - col("n_cf")
    cf.join(broadcast(c), "cat")
      .select(col("cat"), col("fold"), col("n_cf"),
        den.as("n_oof"),
        when(den > 0, ((num - pmod(num, den)) / den).cast("long"))
          .as("enc_oof_micros"))
  }

  /** DuckDB rendering of [[targetEncodeOof]]; `srcSql` must yield
    * (cat, kx, cents).
    */
  def targetEncodeOofOracleSql(srcSql: String, k: Int): String =
    s"""WITH cf AS (
       |  SELECT cat, ${hashBucketSql("kx", k)} AS fold,
       |         COUNT(*) AS n_cf, CAST(SUM(cents) AS BIGINT) AS s_cf
       |  FROM ($srcSql) GROUP BY 1, 2),
       |c AS (SELECT cat, CAST(SUM(n_cf) AS BIGINT) AS n_c,
       |        CAST(SUM(s_cf) AS BIGINT) AS s_c FROM cf GROUP BY 1),
       |j AS (SELECT cf.cat AS cat, cf.fold AS fold, cf.n_cf AS n_cf,
       |        (c.s_c - cf.s_cf) * 1000000 AS num,
       |        (c.n_c - cf.n_cf) AS den
       |      FROM cf JOIN c ON cf.cat = c.cat)
       |SELECT cat, fold, n_cf, den AS n_oof,
       |       CASE WHEN den > 0 THEN
       |         CAST((num - (((num % den) + den) % den)) // den AS BIGINT)
       |       END AS enc_oof_micros
       |FROM j""".stripMargin

  /** Iterative proportional fitting / survey raking (Deming &
    * Stephan 1940): per-cell sampling weights over a 2-D grid
    * (r × c) so the weighted margins match target margins on BOTH
    * axes — the corpus-mixture move "equalize language shares
    * WITHOUT changing source shares" that 1-D mixture sampling
    * (q_o11/q_o19) cannot express. Alternating scaling: each round
    * rescales weights so row sums hit the row targets, then column
    * sums the column targets; fixed `rounds` (the oracle-unrollable
    * contract, cf. k-means/k-core — IPF converges geometrically, 3
    * rounds lands margins within ppm on real grids).
    *
    * Exactness: weights are micros longs; every rescale is ONE
    * flooring division of a decimal product (all quantities
    * positive, so trunc ≡ floor cross-engine). Inputs: `cells`
    * (r, c, n) — the corpus folds ONCE to this grid, everything
    * after is cells-sized metadata; `rowTargets` (r, tr) /
    * `colTargets` (c, tc) in the same count units as n.
    * Output: (r, c, n, w_micros, row_sum, col_sum) where the sums
    * are the achieved weighted margins Σ n·w (micros·count units).
    */
  def ipfWeights(cells: DataFrame, rowTargets: DataFrame,
      colTargets: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    // checkpoint the grid once after the corpus fold and once per
    // round: without it every round's two broadcast sides re-derive
    // the whole upstream lineage and the plan grows geometrically —
    // measured 12.6 → 2.0 s at sf0.1 (the actions run on a
    // ≤cells-sized frame, the iterative-operator cadence)
    var w = cells.join(rowTargets, "r").join(colTargets, "c")
      .select(col("r"), col("c"), col("n"), col("tr"), col("tc"),
        lit(1000000L).as("w"))
      .localCheckpoint()
    val nw = expr("CAST(n AS DECIMAL(38,0)) * w")
    for (_ <- 1 to rounds) {
      val rs = w.groupBy(col("r").as("rr")).agg(sum(nw).as("rsum"))
      w = w.join(broadcast(rs), col("rr") === col("r"))
        .withColumn("w",
          expr("CAST(w AS DECIMAL(38,0)) * tr * 1000000 div rsum"))
        .drop("rr", "rsum")
      val cs = w.groupBy(col("c").as("cc")).agg(sum(nw).as("csum"))
      w = w.join(broadcast(cs), col("cc") === col("c"))
        .withColumn("w",
          expr("CAST(w AS DECIMAL(38,0)) * tc * 1000000 div csum"))
        .drop("cc", "csum")
        .localCheckpoint()
    }
    val rsF = w.groupBy(col("r").as("rr")).agg(sum(nw).as("row_sum"))
    val csF = w.groupBy(col("c").as("cc")).agg(sum(nw).as("col_sum"))
    w.join(broadcast(rsF), col("rr") === col("r"))
      .join(broadcast(csF), col("cc") === col("c"))
      .select(col("r"), col("c"), col("n"), col("w").as("w_micros"),
        col("row_sum").cast("long").as("row_sum"),
        col("col_sum").cast("long").as("col_sum"))
  }

  /** DuckDB rendering of [[ipfWeights]]: `cellsSql` yields (r, c, n),
    * `rowTargetsSql` (r, tr), `colTargetsSql` (c, tc).
    */
  def ipfWeightsOracleSql(cellsSql: String, rowTargetsSql: String,
      colTargetsSql: String, rounds: Int): String = {
    val steps = (1 to rounds).map { i =>
      val prev = if (i == 1) "w0" else s"wc${i - 1}"
      s"""rs$i AS (SELECT r, CAST(SUM(CAST(n AS HUGEINT) * w) AS HUGEINT)
         |           AS rsum FROM $prev GROUP BY r),
         |wr$i AS (SELECT p.r, p.c, p.n, p.tr, p.tc,
         |           CAST(CAST(p.w AS HUGEINT) * p.tr * 1000000
         |                // rs$i.rsum AS BIGINT) AS w
         |         FROM $prev p JOIN rs$i ON rs$i.r = p.r),
         |cs$i AS (SELECT c, CAST(SUM(CAST(n AS HUGEINT) * w) AS HUGEINT)
         |           AS csum FROM wr$i GROUP BY c),
         |wc$i AS (SELECT p.r, p.c, p.n, p.tr, p.tc,
         |           CAST(CAST(p.w AS HUGEINT) * p.tc * 1000000
         |                // cs$i.csum AS BIGINT) AS w
         |         FROM wr$i p JOIN cs$i ON cs$i.c = p.c)""".stripMargin
    }.mkString(",\n")
    s"""WITH cells AS ($cellsSql),
       |rt AS ($rowTargetsSql),
       |ct AS ($colTargetsSql),
       |w0 AS (SELECT cells.r, cells.c, cells.n, rt.tr, ct.tc,
       |         CAST(1000000 AS BIGINT) AS w
       |       FROM cells JOIN rt ON rt.r = cells.r
       |                  JOIN ct ON ct.c = cells.c),
       |$steps,
       |rsf AS (SELECT r, CAST(SUM(CAST(n AS HUGEINT) * w) AS BIGINT)
       |          AS row_sum FROM wc$rounds GROUP BY r),
       |csf AS (SELECT c, CAST(SUM(CAST(n AS HUGEINT) * w) AS BIGINT)
       |          AS col_sum FROM wc$rounds GROUP BY c)
       |SELECT r, c, n, w_micros, row_sum, col_sum FROM (
       |  SELECT p.r AS r, p.c AS c, p.n AS n, p.w AS w_micros,
       |         rsf.row_sum, csf.col_sum
       |  FROM wc$rounds p JOIN rsf ON rsf.r = p.r
       |                   JOIN csf ON csf.c = p.c)""".stripMargin
  }

  /** Coverage-seeking mixture reweighting — the Group-DRO / DoReMi
    * family primitive (Sagawa ICLR'20; Xie et al. '23), made
    * deterministic: exponentiated-gradient ascent where each source's
    * "excess loss" is its L1 distance Σ|p−m| from the CURRENT
    * mixture's unigram distribution (= 2× total variation; the
    * output column is named l1_ppm accordingly, range 0..2·10⁶). Sources the mixture fails to
    * cover get upweighted; because the mixture moves each round, the
    * rounds genuinely interact (unlike a static-loss MW update, which
    * collapses to one closed-form step). DoReMi's exp(η·loss) update
    * is replaced by the fixed-point multiplier w·(10⁶ + η·tv)/10⁶ —
    * first-order identical for small η·tv and exactly replayable:
    * every probability is a ppm floor, every update a truncating
    * integer division, so the gate hashes bit-for-bit.
    *
    * Scale shape: the fact collapses ONCE to the (source, token)
    * count table; each round is one vocab-sized join against the
    * broadcast source-weight table plus one grouped sum — no fact
    * rescan, no window. TV against the mixture needs the
    * absent-token mass too: TV_i = Σ_{t∈i}|p_i·10⁶ − m_t| +
    * (Σ_t m_t − Σ_{t∈i} m_t), all from the same join. Long bounds:
    * m_t ≤ 10¹², per-source sums ≤ vocab·10¹² — lift to DECIMAL(38)
    * past ~10⁶ vocab terms per source; the shape is unchanged.
    *
    * Returns one row per source: (source, l1_ppm of the final round,
    * w_ppm final normalized weight).
    */
  def coverageReweight(
      df: DataFrame,
      sourceCol: String,
      textCol: String,
      rounds: Int = 2,
      etaPpm: Long = 500000L): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val pd = df.select(col(sourceCol).as("source"),
        explode(TextOps.tokens(col(textCol))).as("tk"))
      .groupBy("source", "tk").agg(count(lit(1)).as("cnt"))
    val tot = pd.groupBy("source").agg(sum("cnt").as("tot"))
    // the per-source unigram distribution, ppm floors; reused every
    // round — checkpoint so rounds don't replay the fact scan
    val p = pd.join(tot, "source")
      .select(col("source"), col("tk"),
        expr("cnt * 1000000 div tot").as("p_ppm"))
      .localCheckpoint()
    var w = tot.select(col("source"))
      .crossJoin(broadcast(tot.agg(count(lit(1)).as("ns"))))
      .select(col("source"), expr("1000000 div ns").as("w"))
    var tv: DataFrame = null
    for (_ <- 1 to rounds) {
      val m = p.join(broadcast(w), "source")
        .groupBy("tk").agg(sum(expr("w * p_ppm")).as("m"))
      val mtot = m.agg(sum("m").as("mtot"))
      tv = p.join(m, "tk").groupBy("source")
        .agg(sum(expr("abs(p_ppm * 1000000 - m)")).as("a"),
          sum("m").as("b"))
        .crossJoin(broadcast(mtot))
        .select(col("source"), expr("(a - b + mtot) div 1000000").as("tv_ppm"))
      val wr = w.join(tv, "source").select(col("source"),
        expr(s"w * (1000000 + tv_ppm * $etaPpm div 1000000) div 1000000")
          .as("wr"))
      val wsum = wr.agg(sum("wr").as("ws"))
      w = wr.crossJoin(broadcast(wsum))
        .select(col("source"), expr("wr * 1000000 div ws").as("w"))
        .localCheckpoint() // source-count-sized; cuts per-round lineage
    }
    // output name is l1_ppm: the quantity is the L1 distance
    // Σ|p−m| (range 0..2·10⁶ ppm) = 2× total variation. The update
    // multiplier uses it raw (a constant-factor rescale of η), but
    // the METRIC must not be labeled TV at half its actual range.
    w.join(tv, "source")
      .select(col("source"), col("tv_ppm").as("l1_ppm"),
        col("w").as("w_ppm"))
  }

  /** DuckDB oracle replaying [[coverageReweight]] round-for-round over
    * a docs subquery producing (source, toks list).
    */
  def coverageReweightOracleSql(
      docsSql: String,
      rounds: Int = 2,
      etaPpm: Long = 500000L): String = {
    val steps = (1 to rounds).map { r =>
      val wp = if (r == 1) "w0" else s"w${r - 1}"
      s"""m$r AS (SELECT tk, CAST(SUM(w * p_ppm) AS BIGINT) AS m
         |  FROM p JOIN $wp USING (source) GROUP BY tk),
         |mt$r AS (SELECT CAST(SUM(m) AS BIGINT) AS mtot FROM m$r),
         |d$r AS (SELECT source, (a - b + mtot) // 1000000 AS tv_ppm
         |  FROM (SELECT source,
         |          CAST(SUM(ABS(p_ppm * 1000000 - m)) AS BIGINT) AS a,
         |          CAST(SUM(m) AS BIGINT) AS b
         |        FROM p JOIN m$r USING (tk) GROUP BY source)
         |  CROSS JOIN mt$r),
         |u$r AS (SELECT $wp.source,
         |    w * (1000000 + tv_ppm * $etaPpm // 1000000) // 1000000 AS wr
         |  FROM $wp JOIN d$r USING (source)),
         |s$r AS (SELECT CAST(SUM(wr) AS BIGINT) AS ws FROM u$r),
         |w$r AS (SELECT source, wr * 1000000 // ws AS w
         |  FROM u$r CROSS JOIN s$r)""".stripMargin
    }.mkString(",\n")
    s"""WITH docs AS ($docsSql),
       |pd AS (SELECT source, tk, CAST(COUNT(*) AS BIGINT) AS cnt
       |       FROM (SELECT source, unnest(toks) AS tk FROM docs)
       |       GROUP BY 1, 2),
       |tot AS (SELECT source, CAST(SUM(cnt) AS BIGINT) AS tot
       |        FROM pd GROUP BY 1),
       |ns AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM tot),
       |p AS (SELECT pd.source, tk, cnt * 1000000 // tot AS p_ppm
       |      FROM pd JOIN tot USING (source)),
       |w0 AS (SELECT source, 1000000 // n AS w FROM tot CROSS JOIN ns),
       |$steps
       |SELECT w$rounds.source, d$rounds.tv_ppm AS l1_ppm, w$rounds.w AS w_ppm
       |FROM w$rounds JOIN d$rounds USING (source)
       |ORDER BY source""".stripMargin
  }
}
