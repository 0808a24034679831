package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition by iterative peeling (Seidman '83; the
  * distributed rendering is the synchronous peel of Montresor et
  * al. '13): repeatedly delete every node whose degree in the
  * CURRENT subgraph is < k until none remains. The survivors are the
  * k-core — the densely-linked kernel of a near-dup candidate graph
  * (template/boilerplate families close into high-core cliques while
  * genuine-content chains peel away at k=2), and the graph-shape
  * complement to Triangles' closure measure: gcc says edges close,
  * coreness says how deep the dense kernel goes.
  *
  * Determinism contract: the peel is a pure set fixpoint — no
  * arithmetic beyond integer degree counts — so round state is a
  * pure function of the edge set in any engine and under any
  * partitioning. A synchronous round removes ALL sub-k nodes at
  * once; each round runs on the edge set the previous round left.
  * `peel(k, iters)` runs a FIXED `iters` rounds (the oracle replays
  * them as unrolled CTEs, like PageRank's); the peel is monotone —
  * edge sets only shrink — so once a round removes nothing the state
  * is the true k-core, and KCoreSpec proves the catalog graph
  * reaches that fixpoint within the replayed rounds.
  *
  * Scale shape: per round ONE map-side-combining degree agg over the
  * live edge list plus two semi-join-shaped filters of edges against
  * the |V|-sized alive table — the same per-round cost envelope as
  * ConnectedComponents' star rounds, AQE-skew-splittable on hubs.
  * Rounds needed = peel depth, typically ≤ a few dozen even on
  * web-scale graphs (hubs survive; chains peel in parallel, not one
  * node at a time). `localCheckpoint` every `checkpointEvery` rounds
  * truncates lineage exactly as CC/PageRank do.
  *
  * RECOMPUTE-CADENCE CONTRACT (the incremental-maintenance stance,
  * cf. ConnectedComponents.incremental / PageRank.ranksConverged):
  * k-core is NOT incrementally maintained here — deleting or adding
  * one edge can cascade peels arbitrarily far (coreness is a global
  * fixpoint, unlike CC's purely-growing merge structure), so a sound
  * delta algorithm needs the full traversal machinery of Sarıyüce et
  * al.'s incremental core maintenance, which buys little when the
  * consumer (template-family detection) reads the core at curation
  * cadence, not per arrival batch. Contract: recompute per curation
  * run over the current candidate graph; cost is O(peel-depth)
  * rounds over edges that only shrink — the cheapest of the graph
  * suite's iterations — and the run is deterministic, so replays are
  * free to schedule.
  */
object KCore {

  /** Nodes of the k-core approximation after `iters` synchronous peel
    * rounds over the undirected simple graph induced by
    * (srcCol, dstCol): self-loops dropped, parallel/reverse edges
    * collapsed. Output (node, degree) — degree measured INSIDE the
    * surviving subgraph, filtered to ≥ k (at fixpoint: the k-core
    * and its core degrees).
    */
  def peel(edges: DataFrame, srcCol: String, dstCol: String,
      k: Int, iters: Int, checkpointEvery: Int = 1): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(iters >= 1, "iters must be >= 1")
    var e = edges
      .select(least(col(srcCol), col(dstCol)).cast("long").as("u"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint()
    for (i <- 1 to iters) {
      // alive is |V|-sized and referenced by BOTH semi-filters; left
      // lazy it would re-run the degree agg twice per round, and an
      // unmaterialized e compounds ~5x re-execution per round (the
      // r8 bench measured 18.4s at checkpointEvery=4 vs 3.9s here)
      val alive = degrees(e).filter(col("degree") >= k).localCheckpoint()
      e = e
        .join(alive.select(col("node").as("u")), Seq("u"))
        .join(alive.select(col("node").as("v")), Seq("v"))
        .select("u", "v")
      if (i % checkpointEvery == 0 && i < iters) e = e.localCheckpoint()
    }
    degrees(e).filter(col("degree") >= k)
  }

  /** Warm-started peel for APPEND-ONLY batches (r10 — the
    * incremental/warm face CC and PageRank already have): under edge
    * ADDITIONS the k-core is monotone non-decreasing — every degree
    * in every subgraph only grew, so the prior core is still a
    * subgraph of min degree ≥ k and its nodes can be PINNED alive;
    * the peel only adjudicates the rest of the graph.
    *
    * SOUNDNESS (exactly the true new k-core, not an approximation):
    * iterated deletion of deg<k nodes never deletes a true-core node,
    * and pinning only REDUCES deletions, so the fixpoint survivor set
    * S ⊇ new core. Conversely every unpinned node of S has deg_S ≥ k
    * by the stopping rule, and every pinned node has deg_S ≥
    * deg_core ≥ k because pinned ⊆ prior core ⊆ new core ⊆ S — so S
    * has min degree ≥ k and S ⊆ core by maximality. S = core,
    * KCoreSpec proves warm ≡ cold on planted additions.
    *
    * What the warm start buys: the pinned mass (typically the bulk
    * of a near-dup candidate graph's dense kernel) drops out of the
    * per-round alive adjudication — alive is pinned ∪ {deg ≥ k},
    * and rounds converge in the peel depth of the NEW material
    * rather than flapping the settled kernel. Cost shape per round
    * is unchanged (one degree agg + two semi-filters).
    *
    * DELETION CAVEAT (the contract's hard edge): edge REMOVALS can
    * demote prior-core nodes, and pinning a demoted node wrongly
    * keeps it AND its neighbors (KCoreSpec demonstrates the
    * counterexample: a triangle minus one edge warm-reports the apex
    * where the cold peel reports nothing). A batch containing any
    * deletion must run the cold [[peel]]; the house cadence is
    * append-only ingest between curation-cadence cold recomputes,
    * mirroring ConnectedComponents.incremental's stance.
    *
    * `priorCore`: one column `node` — [[peel]]'s output (or any
    * SUBSET of the true prior core; pinning fewer nodes is always
    * sound, pinning non-core nodes never is).
    */
  def peelWarm(edges: DataFrame, srcCol: String, dstCol: String,
      priorCore: DataFrame, k: Int, iters: Int,
      checkpointEvery: Int = 1): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(iters >= 1, "iters must be >= 1")
    var e = edges
      .select(least(col(srcCol), col(dstCol)).cast("long").as("u"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint()
    // STATS RESET, not just a lineage cut: Dataset.localCheckpoint
    // carries the PRE-checkpoint sizeInBytes ESTIMATE into the
    // LogicalRDD it returns (not the materialized size). A prior core
    // produced by an 8-round peel carries an estimate whose BigInt
    // digit count grew ~3× per round (each round's size walk
    // multiplies child estimates); compounding ~8 warm rounds on top
    // pushed the estimate to ~10^8 digits and Catalyst's size-product
    // walk (SizeInBytesOnlyStatsPlanVisitor) burned MINUTES of driver
    // CPU per checkpoint — observed as a bench hang. Rebuilding a
    // fresh scan over the already-checkpointed rows restores
    // unknown-size defaults, at the cost of one row conversion per
    // use of the node-sized pinned table.
    val ckpt = priorCore.select(col("node").cast("long"))
      .distinct().localCheckpoint()
    val pinned = ckpt.sparkSession.createDataFrame(ckpt.rdd, ckpt.schema)
    for (i <- 1 to iters) {
      val alive = degrees(e).filter(col("degree") >= k).select("node")
        .unionAll(pinned).distinct().localCheckpoint()
      e = e
        .join(alive.select(col("node").as("u")), Seq("u"))
        .join(alive.select(col("node").as("v")), Seq("v"))
        .select("u", "v")
      if (i % checkpointEvery == 0 && i < iters) e = e.localCheckpoint()
    }
    degrees(e).filter(col("degree") >= k)
  }

  private def degrees(e: DataFrame): DataFrame =
    e.select(col("u").as("node"))
      .unionAll(e.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))

  /** DuckDB oracle replaying `peel` round-for-round (unrolled CTEs)
    * over an edge subquery producing (src, dst). Ends with
    * `SELECT node, degree FROM core` — append ORDER BY.
    *
    * Round CTEs are `AS MATERIALIZED`: each e_i/a_i is referenced
    * 2-3× by the next round, and DuckDB inlines plain CTEs — the
    * unrolled chain would otherwise expand ~5^iters scans of the
    * base parquet (observed as an fd-exhaustion error at 8 rounds).
    * PageRank's chain is strictly linear so its oracle never hit
    * this; any multiply-referenced unrolled round must materialize.
    */
  def oracleSql(edgesSql: String, k: Int, iters: Int): String = {
    val rounds = (1 to iters).map { i =>
      s"""a$i AS MATERIALIZED (SELECT node FROM (
         |    SELECT node, CAST(COUNT(*) AS BIGINT) AS degree
         |    FROM (SELECT u AS node FROM e${i - 1}
         |          UNION ALL SELECT v AS node FROM e${i - 1})
         |    GROUP BY 1) WHERE degree >= $k),
         |e$i AS MATERIALIZED (SELECT u, v FROM e${i - 1}
         |  WHERE u IN (SELECT node FROM a$i)
         |    AND v IN (SELECT node FROM a$i))""".stripMargin
    }.mkString(",\n")
    s"""WITH ein AS ($edgesSql),
       |e0 AS MATERIALIZED (
       |       SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
       |       FROM ein WHERE src <> dst),
       |$rounds,
       |core AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS degree
       |  FROM (SELECT u AS node FROM e$iters
       |        UNION ALL SELECT v AS node FROM e$iters)
       |  GROUP BY 1 HAVING COUNT(*) >= $k)
       |SELECT node, degree FROM core""".stripMargin
  }
}
