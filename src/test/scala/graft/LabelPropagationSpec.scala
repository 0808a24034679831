package graft

import org.apache.spark.sql.functions._

import graft.operators.{ConnectedComponents, LabelPropagation}

/** Label propagation vs connectivity: two dense blobs bridged by a
  * single edge stay SEPARATE communities under LPA while CC fuses
  * them — the property that earns a third iterative-graph operator.
  */
class LabelPropagationSpec extends SparkSpec {
  import spark.implicits._

  // blob A = clique on 0..4, blob B = clique on 10..14, one bridge
  private def clique(ids: Seq[Long]) =
    for { a <- ids; b <- ids if a < b } yield (a, b)
  lazy val edges =
    (clique(0L to 4L) ++ clique(10L to 14L) :+ (4L, 10L))
      .toDF("src", "dst")

  test("bridged cliques: LPA separates what CC fuses") {
    val lpa = LabelPropagation.communities(edges, "src", "dst", iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L to 4L).map(lpa).toSet.size == 1, s"blob A split: $lpa")
    assert((10L to 14L).map(lpa).toSet.size == 1, s"blob B split: $lpa")
    assert(lpa(0L) != lpa(14L), s"blobs fused: $lpa")
    val cc = ConnectedComponents.run(edges, "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc.values.toSet.size == 1, "CC must fuse the bridged graph")
  }

  test("deterministic and partitioning-invariant; min-label tie-break") {
    val a = LabelPropagation.communities(edges, "src", "dst", iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    val b = LabelPropagation
      .communities(edges.repartition(7), "src", "dst", iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    assert(a == b)
    // a symmetric pair with self-votes lands on the smaller label
    val pair = Seq((7L, 8L)).toDF("src", "dst")
    val got = LabelPropagation.communities(pair, "src", "dst", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(7L -> 7L, 8L -> 7L), got.toString)
  }

  test("self-loops and duplicate edges are ignored; isolated direction " +
      "symmetrized") {
    val messy = Seq((1L, 2L), (2L, 1L), (1L, 1L), (1L, 2L))
      .toDF("src", "dst")
    val got = LabelPropagation.communities(messy, "src", "dst", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L))
  }
}
