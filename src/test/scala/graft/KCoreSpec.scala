package graft

import org.apache.spark.sql.functions._

import graft.operators.KCore

/** k-core peel on planted graphs: clique survival, chain peel-away,
  * monotone fixpoint, normalization, and the catalog graph's
  * fixpoint-within-replayed-rounds claim.
  */
class KCoreSpec extends SparkSpec {
  import spark.implicits._

  private def core(edges: Seq[(Long, Long)], k: Int, iters: Int = 8) =
    KCore.peel(edges.toDF("src", "dst"), "src", "dst", k, iters)
      .as[(Long, Long)].collect().toMap

  test("clique with pendant chain: chain peels, clique survives with core degrees") {
    // K5 on 0..4 plus chain 4-10-11-12
    val k5 = for { a <- 0L to 4L; b <- 0L to 4L if a < b } yield (a, b)
    val g = k5 ++ Seq((4L, 10L), (10L, 11L), (11L, 12L))
    val r = core(g, k = 3)
    assert(r.keySet == Set(0L, 1L, 2L, 3L, 4L))
    assert(r.values.forall(_ == 4L)) // degrees measured INSIDE the core
  }

  test("2-core of a pure chain is empty; 1-core keeps it") {
    val chain = Seq((0L, 1L), (1L, 2L), (2L, 3L))
    assert(core(chain, k = 2).isEmpty)
    assert(core(chain, k = 1).keySet == Set(0L, 1L, 2L, 3L))
  }

  test("self-loops, reversed and parallel edges collapse before peeling") {
    // triangle with noise: loops and both directions
    val messy = Seq((0L, 1L), (1L, 0L), (0L, 1L), (1L, 2L), (2L, 0L), (2L, 2L))
    val r = core(messy, k = 2)
    assert(r == Map(0L -> 2L, 1L -> 2L, 2L -> 2L))
  }

  test("peel is monotone: extra rounds past the fixpoint change nothing") {
    // two triangles bridged by a chain; the bridge nodes have degree 2,
    // so the whole structure IS the 2-core (a 3-core would drop it all)
    val g = Seq((0L, 1L), (1L, 2L), (2L, 0L),
      (2L, 5L), (5L, 6L),
      (6L, 7L), (7L, 8L), (8L, 6L))
    val r4 = core(g, k = 2, iters = 4)
    val r8 = core(g, k = 2, iters = 8)
    assert(r4 == r8)
    assert(r4.keySet == Set(0L, 1L, 2L, 5L, 6L, 7L, 8L))
    assert(core(g, k = 3).isEmpty)
  }

  test("catalog graph reaches its 4-core fixpoint within the 8 replayed rounds") {
    val sparse = Tables.lineitem(spark, Sf0001)
      .filter(col("l_linenumber") === 1)
      .select((col("l_orderkey") % 3000).as("src"),
        ((col("l_orderkey") * 7 + col("l_partkey")) % 3000).as("dst"))
    val n1 = Tables.nation(spark, Sf0001).select(col("n_nationkey"))
    val clique = n1.as("a")
      .join(n1.as("b"), col("a.n_nationkey") < col("b.n_nationkey"))
      .select(col("a.n_nationkey").as("src"),
        col("b.n_nationkey").as("dst"))
    val g = sparse.unionByName(clique)
    val r8 = KCore.peel(g, "src", "dst", k = 4, iters = 8)
      .as[(Long, Long)].collect().toMap
    val r10 = KCore.peel(g, "src", "dst", k = 4, iters = 10)
      .as[(Long, Long)].collect().toMap
    assert(r8 == r10)
    // the planted 25-clique is always inside the 4-core
    assert((0L to 24L).forall(r8.contains))
  }
}
