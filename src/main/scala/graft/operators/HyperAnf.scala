package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HyperANF (Boldi, Rosa & Vigna, WWW'11): the neighborhood function
  * N(t) = Σ_v |ball(v, t)| of a graph, estimated by giving every node
  * an HLL sketch of its reachable set and, each round, merging every
  * node's sketch with its in-neighbors' — register-wise MAX, the HLL
  * union. N(t) is how reachability GROWS with distance: the
  * effective-diameter estimate (first t where N(t) ≥ 0.9·N(∞)) and
  * the connectivity health-check for the dedup cluster graph at a
  * scale where exact BFS-from-every-node is quadratic fantasy.
  *
  * Everything rides the deterministic [[Sketch]] HLL stack (integer
  * affine-square hash, trailing-zero ranks, register MAX — all
  * engine-replayable; the estimate finish is the exact q_a5
  * arithmetic), so the whole iteration unrolls into oracle CTEs.
  *
  * Scale shape per round: registers live as (v, bucket, mj) rows —
  * at most m=256 per node, in practice min(|ball|, 256) — and the
  * round is ONE join (edges ⋈ registers on src, projecting to dst)
  * + union + group-max on (v, bucket): map-side partial max, one
  * exchange keyed by node. localCheckpoint between rounds cuts the
  * lineage exactly like PageRank/CC. The per-node finish + global
  * sum is register-table-sized. Total: O(rounds) shuffles, no
  * quadratic path anywhere — THE published algorithm for diameter
  * at 100 TB graph scale.
  *
  * Register width `m` defaults to 256 (the shared [[Sketch]] stack's
  * width, so the m=256 oracle replay is one arithmetic); production
  * HyperANF typically shrinks m to 2⁵–2⁷ — per-round join volume is
  * |E| × occupied registers, so m is THE direct cost lever (rsd
  * grows as 1.04/√m: m=32 trades ~18% per-node error — fine for an
  * effective-diameter read — for an 8× smaller register table).
  * The finish constants fork per m inside [[Sketch.alphaM2]]; the
  * plan shape is m-independent.
  *
  * RECOMPUTE-CADENCE CONTRACT (cf. ConnectedComponents.incremental /
  * PageRank.ranksConverged): HyperANF is NOT incrementally
  * maintained — HLL registers are max-merged, so edge ADDITIONS
  * could warm-start from saved per-node registers, but removals
  * cannot be subtracted from a max-sketch, and the consumer
  * (effective-diameter / connectivity health of the dedup graph) is
  * a monitoring read at corpus-snapshot cadence, not a per-batch
  * one. Contract: recompute per snapshot; the run is O(rounds)
  * shuffles on register tables ≤ |V|·m rows, and shrinking m (the
  * m=32 catalog variant measures 4.3× cheaper than m=256) is the
  * sanctioned knob when the cadence tightens.
  */
object HyperAnf {

  /** Neighborhood-function table (t, nf) for t = 0..rounds, where nf
    * = Σ_v hll_est(ball(v, t)) over `edges` (src, dst) treated as
    * directed reach-TO edges; pass both directions for undirected
    * graphs. Deterministic and partitioning-invariant.
    */
  def neighborhoodFunction(edges: DataFrame, rounds: Int,
      m: Int = 256): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .distinct().localCheckpoint()
    val nodes = e.select(col("src").as("v"))
      .unionByName(e.select(col("dst").as("v"))).distinct()
    var reg = Sketch.hllRegisters(
      nodes.withColumn("k", col("v")), Seq("v"), "k", m).localCheckpoint()

    def nf(t: Int, r: DataFrame): DataFrame =
      Sketch.hllFinish(r, Seq("v"), m)
        .agg(lit(t).as("t"), sum("hll_est").as("nf"))

    var out = nf(0, reg)
    for (t <- 1 to rounds) {
      val pushed = e.join(reg.withColumnRenamed("v", "src"), Seq("src"))
        .select(col("dst").as("v"), col("bucket"), col("mj"))
      reg = reg.unionByName(pushed)
        .groupBy("v", "bucket").agg(max("mj").as("mj"))
        .localCheckpoint()
      out = out.unionByName(nf(t, reg))
    }
    out.orderBy("t")
  }

  /** Per-node harmonic centrality by HyperBall (Boldi & Vigna,
    * "In-Core Computation of Geometric Centralities with HyperBall",
    * ICDMW'13): hc(v) = Σ_{u≠v} 1/d(u→v), accumulated from the SAME
    * register rounds as [[neighborhoodFunction]] — each round's
    * per-node ball-size delta is the (estimated) count of nodes first
    * reached at distance t, weighted 1/t. Truncated at `rounds` (the
    * published trick: centrality mass beyond the effective diameter
    * is negligible, and the truncation radius is explicit).
    *
    * Exactness: the per-node HLL estimate is the deterministic
    * [[Sketch.hllFinish]] long; the output is
    * hc_scaled = Σ_t (est_t − est_{t−1}) · (L/t) with L =
    * lcm(1..rounds) — integer weights, NO division anywhere, so the
    * value is an order-free exact integer even when a small-range
    * regime switch makes a delta negative (where trunc-vs-floor
    * division semantics would diverge across engines). True harmonic
    * centrality ≈ hc_scaled / L.
    *
    * Scale shape: identical to [[neighborhoodFunction]] — O(rounds)
    * shuffles on the register table — plus one |V|-sized join per
    * round to carry (running sum, previous estimate).
    */
  def harmonicCentrality(edges: DataFrame, rounds: Int,
      m: Int = 256): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val weights = harmonicWeights(rounds)
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .distinct().localCheckpoint()
    val nodes = e.select(col("src").as("v"))
      .unionByName(e.select(col("dst").as("v"))).distinct()
    var reg = Sketch.hllRegisters(
      nodes.withColumn("k", col("v")), Seq("v"), "k", m).localCheckpoint()

    var hc = Sketch.hllFinish(reg, Seq("v"), m)
      .select(col("v"), lit(0L).as("s"), col("hll_est").as("p"))
    for (t <- 1 to rounds) {
      val pushed = e.join(reg.withColumnRenamed("v", "src"), Seq("src"))
        .select(col("dst").as("v"), col("bucket"), col("mj"))
      reg = reg.unionByName(pushed)
        .groupBy("v", "bucket").agg(max("mj").as("mj"))
        .localCheckpoint()
      hc = hc.join(Sketch.hllFinish(reg, Seq("v"), m), "v")
        .select(col("v"),
          (col("s") + (col("hll_est") - col("p")) * lit(weights(t - 1)))
            .as("s"),
          col("hll_est").as("p"))
      // no per-round localCheckpoint on the carry: A/B'd 8.5 → 12.1 s
      // — the checkpoint ACTION per round costs more than the 3-deep
      // lazy join tree saves (registers already checkpoint; the carry
      // is |V|-sized metadata)
    }
    hc.select(col("v"), col("s").as("hc_scaled"))
  }

  /** Integer round weights L/t for t = 1..rounds, L = lcm(1..rounds). */
  def harmonicWeights(rounds: Int): Seq[Long] = {
    @annotation.tailrec
    def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
    val l = (1L to rounds.toLong).foldLeft(1L)((a, b) => a / gcd(a, b) * b)
    (1 to rounds).map(t => l / t)
  }
}
