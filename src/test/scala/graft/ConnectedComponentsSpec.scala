package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.operators.ConnectedComponents

/** Large-star/small-star connected components vs a driver-side
  * union-find ground truth.
  */
class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side union-find with path compression, min-id labeling. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x
      else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    // min-id relabel: the union order above keeps the min as root, but
    // re-derive from scratch to be safe.
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val groups = nodes.groupBy(find)
    groups.flatMap { case (_, ms) =>
      val m = ms.min; ms.map(_ -> m)
    }
  }

  private def runCC(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.run(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("random graphs across seeds match union-find") {
    for (seed <- Seq(1, 7, 42)) {
      val rnd = new Random(seed)
      val n = 400
      val edges = Seq.fill(300)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      assert(runCC(edges) == unionFind(edges), s"seed=$seed")
    }
  }

  test("long chain collapses to one component (log-round contraction)") {
    val chain = (0L until 300L).sliding(2).map(s => (s(1), s(0))).toSeq
    val got = runCC(chain)
    assert(got.size == 300 && got.values.toSet == Set(0L))
  }

  test("star, duplicate and reversed edges, multiple components") {
    val edges = Seq[(Long, Long)](
      (10, 1), (1, 10), (10, 5), (5, 10), (10, 7), // star rooted at 1
      (20, 21), (21, 22),                          // path
      (30, 30),                                    // self-loop only: dropped
      (40, 41), (40, 41))                          // dup edge
    val got = runCC(edges)
    assert(got == Map(
      1L -> 1L, 5L -> 1L, 7L -> 1L, 10L -> 1L,
      20L -> 20L, 21L -> 20L, 22L -> 20L,
      40L -> 40L, 41L -> 40L))
  }

  test("empty edge set yields empty result") {
    assert(runCC(Seq.empty).isEmpty)
  }

  test("clusters() sizes match run() groupBy") {
    val edges = Seq[(Long, Long)]((1, 2), (2, 3), (7, 8))
    val sizes = ConnectedComponents.clusters(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sizes == Map(1L -> 3L, 7L -> 2L))
  }
}
