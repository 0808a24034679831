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

  /** Unrolled-rounds DuckDB replay (the PageRank.oracleSql
    * convention): `edgesSql` must select (src, dst).
    */
  def oracleSql(edgesSql: String, iters: Int): String = {
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
    s"""WITH e0 AS (SELECT DISTINCT src, dst FROM ($edgesSql) WHERE src <> dst),
       |und AS (SELECT src, dst FROM e0
       |        UNION SELECT dst AS src, src AS dst FROM e0),
       |n AS (SELECT DISTINCT src AS node FROM und),
       |l0 AS (SELECT node, node AS lab FROM n),
       |$rounds
       |SELECT node, lab AS community FROM l$iters""".stripMargin
  }
}
