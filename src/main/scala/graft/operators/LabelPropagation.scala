package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration synchronous label propagation (Raghavan et al.
  * 2007) — community detection for curation: topical grouping of
  * near-dup graphs, domain clustering of link graphs. The third
  * iterative-graph member beside ConnectedComponents (connectivity)
  * and PageRank (authority): LPA finds DENSE regions, not just
  * reachable ones — two communities bridged by one edge stay
  * separate where CC fuses them.
  *
  * Determinism contract: labels start as node ids; each round every
  * node adopts the most frequent label among its neighbors' current
  * labels PLUS one self-vote (the standard damping that keeps the
  * synchronous update from oscillating on bipartite structure), ties
  * broken by the SMALLEST label. Vote counts are exact integers and
  * the argmax is fully ordered, so the label state after k rounds is
  * a pure function of the edge set — the oracle replays all k rounds
  * as unrolled CTEs (the PageRank convention) and hash-matches.
  *
  * Scale shape: one distinct + symmetrize up front (localCheckpointed
  * — every round reuses the undirected edge list instead of
  * re-deriving it); per round ONE shuffle-join of edges against the
  * label table and one map-side-combining vote count, then an argmax
  * AGGREGATE (`max(struct(cnt, -lab))` — no window, no per-node
  * sort). `checkpointEvery` truncates lineage like the other
  * iterative operators. Isolated nodes (no edges) are out of scope —
  * they are their own community by definition.
  */
object LabelPropagation {

  def communities(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, checkpointEvery: Int = 4): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val e0 = edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
    val und = e0.unionByName(
        e0.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint()
    val nodes = und.select(col("src").as("node")).distinct()

    var lab = nodes.withColumn("lab", col("node"))
    for (i <- 1 to iters) {
      val neighborVotes = und
        .join(lab.withColumnRenamed("node", "dst")
          .withColumnRenamed("lab", "nlab"), Seq("dst"))
        .select(col("src"), col("nlab").as("lab"))
      val votes = neighborVotes
        .unionByName(lab.select(col("node").as("src"), col("lab")))
        .groupBy("src", "lab").agg(count(lit(1)).as("cnt"))
      lab = votes
        .groupBy("src")
        .agg(max(struct(col("cnt"), (-col("lab")).as("nl"))).as("m"))
        .select(col("src").as("node"), (-col("m.nl")).as("lab"))
      if (i % checkpointEvery == 0) lab = lab.localCheckpoint()
    }
    lab.select(col("node"), col("lab").as("community"))
  }

  /** The unrolled-rounds CTE chain (the PageRank.oracleSql
    * convention) WITHOUT the final select, so capstones
    * ([[modularity]]) can compose off `l$iters` / `und`:
    * `edgesSql` must select (src, dst).
    */
  def chainCtes(edgesSql: String, iters: Int): String = {
    val rounds = (1 to iters).map { r =>
      val prev = s"l${r - 1}"
      s"""v$r AS (SELECT u.src, l.lab, COUNT(*) AS cnt
         |  FROM und u JOIN $prev l ON l.node = u.dst GROUP BY u.src, l.lab),
         |vs$r AS (SELECT src, lab, cnt FROM v$r
         |  UNION ALL SELECT node AS src, lab, 1 AS cnt FROM $prev),
         |va$r AS (SELECT src, lab, CAST(SUM(cnt) AS BIGINT) AS cnt
         |  FROM vs$r GROUP BY src, lab),
         |l$r AS (SELECT src AS node, lab FROM (
         |    SELECT src, lab, ROW_NUMBER() OVER (PARTITION BY src
         |      ORDER BY cnt DESC, lab) AS rn FROM va$r) WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""e0 AS (SELECT DISTINCT src, dst FROM ($edgesSql) WHERE src <> dst),
       |und AS (SELECT src, dst FROM e0
       |        UNION SELECT dst AS src, src AS dst FROM e0),
       |n AS (SELECT DISTINCT src AS node FROM und),
       |l0 AS (SELECT node, node AS lab FROM n),
       |$rounds""".stripMargin
  }

  /** Unrolled-rounds DuckDB replay: `edgesSql` must select
    * (src, dst).
    */
  def oracleSql(edgesSql: String, iters: Int): String =
    s"""WITH ${chainCtes(edgesSql, iters)}
       |SELECT node, lab AS community FROM l$iters""".stripMargin

  /** Newman modularity of ANY (node, community) assignment over the
    * undirected simple graph — "did the communities mean anything":
    * Q = Σ_c (m_c/m − (D_c/2m)²), the intra-community edge share
    * minus what a degree-preserving random rewiring would give.
    * Q ≈ 0 means the assignment explains nothing; > ~0.3 is real
    * structure. The quality gate for label-propagation / CC cluster
    * outputs before survivorship trusts them.
    *
    * EXACT: over the common denominator 4m², Q·4m² =
    * Σ_c (4·m·m_c − D_c²) — pure integers — and q_ppm is one
    * pre-adjusted floor division (exact on negative Q too). Per
    * community the row carries (n_nodes, m_intra, deg_sum).
    *
    * Scale shape: one canonical-edge fold, one |V|-sized assignment
    * join per endpoint (broadcast-able next to the edge fact), the
    * rest is communities-sized metadata.
    */
  def modularity(edges: DataFrame, srcCol: String, dstCol: String,
      assign: DataFrame): DataFrame = {
    val ec = edges
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    val a = assign.select(col("node"), col("community"))
    val deg = ec.select(col("u").as("node"))
      .unionAll(ec.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("d"))
    val dc = deg.join(a, "node")
      .groupBy("community")
      .agg(count(lit(1)).as("n_nodes"), sum("d").as("deg_sum"))
    val mi = ec
      .join(a.select(col("node").as("u"), col("community").as("cu")), "u")
      .join(a.select(col("node").as("v"), col("community").as("cv")), "v")
      .filter(col("cu") === col("cv"))
      .groupBy(col("cu").as("community"))
      .agg(count(lit(1)).as("m_intra"))
    val m = ec.agg(count(lit(1)).as("m"))
    val cells = dc.join(mi, Seq("community"), "left")
      .na.fill(0L, Seq("m_intra"))
      .crossJoin(broadcast(m))
    val tot = cells.agg(
        sum(lit(4L) * col("m") * col("m_intra")
          - col("deg_sum") * col("deg_sum")).as("num"),
        (lit(4L) * max("m") * max("m")).as("den"))
      .select(expr(
        "(num * 1000000 - ((num * 1000000 % den) + den) % den) div den")
        .as("q_ppm"))
    cells.crossJoin(broadcast(tot))
      .select(col("community"), col("n_nodes"), col("m_intra"),
        col("deg_sum"), col("q_ppm"))
  }

  /** DuckDB CTE block replaying [[modularity]] off an existing
    * canonical-edge CTE `ecT` (u, v — u<v, distinct) and assignment
    * CTE `asT` (node, community); final select reads `mcells ⨯ mq`.
    */
  def modularityCtes(ecT: String, asT: String): String =
    s"""mdeg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM (
       |    SELECT u AS node FROM $ecT
       |    UNION ALL SELECT v AS node FROM $ecT) GROUP BY 1),
       |mdc AS (SELECT a.community, CAST(COUNT(*) AS BIGINT) AS n_nodes,
       |          CAST(SUM(d) AS BIGINT) AS deg_sum
       |        FROM mdeg JOIN $asT a ON a.node = mdeg.node GROUP BY 1),
       |mmi AS (SELECT au.community, CAST(COUNT(*) AS BIGINT) AS m_intra
       |        FROM $ecT e
       |        JOIN $asT au ON au.node = e.u
       |        JOIN $asT av ON av.node = e.v
       |        WHERE au.community = av.community GROUP BY 1),
       |mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM $ecT),
       |mcells AS (SELECT mdc.community, mdc.n_nodes,
       |             COALESCE(mmi.m_intra, 0) AS m_intra, mdc.deg_sum
       |           FROM mdc LEFT JOIN mmi ON mmi.community = mdc.community),
       |mq AS (SELECT ((num * 1000000)
       |          - (((num * 1000000) % den) + den) % den) // den AS q_ppm
       |       FROM (SELECT CAST(SUM(4 * m * m_intra
       |                - deg_sum * deg_sum) AS BIGINT) AS num,
       |               CAST(4 * MAX(m) * MAX(m) AS BIGINT) AS den
       |             FROM mcells CROSS JOIN mm))""".stripMargin
}
