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

  test("peelWarm ≡ cold peel on planted append-only additions " +
      "(pin prior core), including additions that GROW the core") {
    // base: K5 on 0..4 with a pendant chain (3-core = the K5)
    val k5 = for { a <- 0L to 4L; b <- 0L to 4L if a < b } yield (a, b)
    val base = k5 ++ Seq((4L, 10L), (10L, 11L), (11L, 12L))
    val prior = KCore.peel(base.toDF("src", "dst"), "src", "dst",
      k = 3, iters = 8).select("node")
    // append-only batch: (a) a NEW triangle fused to two core nodes so
    // node 20 JOINS the 3-core, (b) more chain noise that still peels
    val added = base ++ Seq((0L, 20L), (1L, 20L), (20L, 2L),
      (12L, 13L), (13L, 14L))
    val cold = KCore.peel(added.toDF("src", "dst"), "src", "dst",
      k = 3, iters = 8).as[(Long, Long)].collect().toMap
    val warm = KCore.peelWarm(added.toDF("src", "dst"), "src", "dst",
      prior, k = 3, iters = 8).as[(Long, Long)].collect().toMap
    assert(warm == cold, "warm start must be EXACT under additions")
    assert(cold.contains(20L), "fixture must actually grow the core")
    // pinning any SUBSET of the prior core is equally sound
    val warmSub = KCore.peelWarm(added.toDF("src", "dst"), "src", "dst",
      prior.limit(2), k = 3, iters = 8)
      .as[(Long, Long)].collect().toMap
    assert(warmSub == cold)
  }

  test("peelWarm deletion caveat: removing an edge breaks the pin " +
      "(the documented counterexample — warm keeps the demoted apex)") {
    val tri = Seq((0L, 1L), (1L, 2L), (2L, 0L))
    val prior = KCore.peel(tri.toDF("src", "dst"), "src", "dst",
      k = 2, iters = 4).select("node")
    val afterDelete = Seq((1L, 2L), (2L, 0L)) // edge (0,1) removed
    val cold = KCore.peel(afterDelete.toDF("src", "dst"), "src", "dst",
      k = 2, iters = 4).as[(Long, Long)].collect().toMap
    val warm = KCore.peelWarm(afterDelete.toDF("src", "dst"), "src",
      "dst", prior, k = 2, iters = 4)
      .as[(Long, Long)].collect().toMap
    assert(cold.isEmpty) // the path has no 2-core
    assert(warm.nonEmpty && warm != cold,
      "fixture must demonstrate WHY deletions require the cold peel")
  }

  // ---- peelAfterDeletions (r11): the decremental dual ----

  private def deleteCore(
      edges: Seq[(Long, Long)],
      deleted: Seq[Long],
      k: Int, iters: Int = 8): Map[Long, Long] = {
    val prior = KCore.peel(edges.toDF("src", "dst"), "src", "dst",
      k, iters).select("node")
    KCore.peelAfterDeletions(edges.toDF("src", "dst"), "src", "dst",
        prior, deleted.toDF("id"), k, iters)
      .as[(Long, Long)].collect().toMap
  }

  private def coldSurviving(
      edges: Seq[(Long, Long)],
      deleted: Set[Long],
      k: Int, iters: Int = 8): Map[Long, Long] =
    core(edges.filter { case (a, b) => !deleted(a) && !deleted(b) },
      k, iters)

  test("peelAfterDeletions handles the demotion peelWarm cannot: " +
      "node deletion dissolves the core exactly like the cold peel") {
    // K4 on 0..3 at k=3: deleting node 0 leaves a triangle — the
    // 3-core dissolves entirely (every survivor demotes)
    val k4 = for { a <- 0L to 3L; b <- 0L to 3L if a < b } yield (a, b)
    assert(deleteCore(k4, Seq(0L), k = 3) ==
      coldSurviving(k4, Set(0L), k = 3))
    assert(deleteCore(k4, Seq(0L), k = 3).isEmpty)
    // K5 minus one member at k=3: the remaining K4 stays a 3-core
    val k5 = for { a <- 0L to 4L; b <- 0L to 4L if a < b } yield (a, b)
    val got = deleteCore(k5, Seq(4L), k = 3)
    assert(got == coldSurviving(k5, Set(4L), k = 3))
    assert(got.keySet == Set(0L, 1L, 2L, 3L) && got.values.forall(_ == 3L))
  }

  test("peelAfterDeletions: deleting a non-core node never changes " +
      "the core; deleting ALL core nodes empties it; unknown ids no-op") {
    val k5 = for { a <- 0L to 4L; b <- 0L to 4L if a < b } yield (a, b)
    val g = k5 ++ Seq((4L, 10L), (10L, 11L)) // chain outside the 3-core
    assert(deleteCore(g, Seq(11L, 999L), k = 3) ==
      core(k5.toSeq, k = 3))
    assert(deleteCore(g, (0L to 4L).toSeq, k = 3).isEmpty)
  }

  test("peelAfterDeletions ≡ cold peel over survivors on random " +
      "graphs and deletion sets across seeds") {
    for (seed <- Seq(5, 23, 47)) {
      val rnd = new scala.util.Random(seed)
      val edges = Seq.fill(300)(
        (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
        .filter { case (a, b) => a != b }
      val deleted = Seq.fill(10)(rnd.nextInt(60).toLong).distinct
      assert(deleteCore(edges, deleted, k = 3) ==
        coldSurviving(edges, deleted.toSet, k = 3), s"seed=$seed")
    }
  }

  test("mixed batch composes deletions-first: peelAfterDeletions " +
      "then peelWarm over the additions ≡ cold peel of the final graph") {
    val k5 = for { a <- 0L to 4L; b <- 0L to 4L if a < b } yield (a, b)
    val g0 = (k5 ++ Seq((4L, 10L), (10L, 11L))).toSeq
    val deleted = Seq(4L)
    val gDel = g0.filter { case (a, b) => a != 4L && b != 4L }
    val added = Seq((0L, 20L), (1L, 20L), (20L, 2L)) // 20 joins the core
    val gFinal = gDel ++ added
    val prior = KCore.peel(g0.toDF("src", "dst"), "src", "dst",
      k = 3, iters = 8).select("node")
    val afterDel = KCore.peelAfterDeletions(g0.toDF("src", "dst"),
      "src", "dst", prior, deleted.toDF("id"), k = 3, iters = 8)
    val got = KCore.peelWarm(gFinal.toDF("src", "dst"), "src", "dst",
        afterDel.select("node"), k = 3, iters = 8)
      .as[(Long, Long)].collect().toMap
    assert(got == core(gFinal, k = 3))
    assert(got.contains(20L) && !got.contains(4L))
  }
}
