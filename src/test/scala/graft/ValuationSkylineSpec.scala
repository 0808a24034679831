package graft

import org.apache.spark.sql.functions._

import graft.operators.{Sampling, Skyline, Valuation}

/** Round-10 batch A: skyline frontier, LOO source valuation,
  * out-of-fold target encoding.
  */
class ValuationSkylineSpec extends SparkSpec {
  import spark.implicits._

  test("pareto2d returns exactly the hand-computed frontier, with " +
      "tie handling: same-x keeps min-y only; equal-y at larger x " +
      "dominates") {
    // maximize x, minimize y
    val rows = Seq(
      ("A", 1L, 10L), ("A", 2L, 5L), ("A", 2L, 7L), ("A", 3L, 5L),
      ("A", 3L, 5L), ("A", 4L, 8L), ("A", 5L, 9L),
      ("B", 1L, 1L)).toDF("g0", "x0", "y0")
    val f = Skyline.pareto2d(rows, "g0", col("x0"), col("y0"))
      .orderBy("g", "x")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    // A: x=5 y=9 (frontier head); x=4 y=8 < 9; x=3 y=5 < 8 (two rows);
    // x=2 best-y 5 dominated by (3,5) — larger x, equal y; x=1 dominated.
    assert(f.toSeq == Seq(
      ("A", 3L, 5L, 2L), ("A", 4L, 8L, 1L), ("A", 5L, 9L, 1L),
      ("B", 1L, 1L, 1L)))
  }

  test("pareto2d satisfies the dominance definition exhaustively") {
    val pts = Seq.tabulate(40) { i =>
      ("g", (i * 7 % 13).toLong, ((i * 11 + 3) % 17).toLong)
    }
    val df = pts.toDF("g0", "x0", "y0")
    val frontier = Skyline.pareto2d(df, "g0", col("x0"), col("y0"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    def dominated(p: (Long, Long)) = pts.exists { case (_, x, y) =>
      x >= p._1 && y <= p._2 && (x > p._1 || y < p._2)
    }
    val all = pts.map(p => (p._2, p._3)).toSet
    assert(frontier == all.filterNot(dominated),
      s"frontier $frontier vs expected ${all.filterNot(dominated)}")
  }

  test("leaveOneSourceOut: hand-computed LOO means and exact " +
      "distinct-text loss") {
    val docs = Seq(
      ("A", "x y"), ("A", "shared"),
      ("B", "shared"), ("B", "a b c"),
      ("C", "only c")).toDF("source", "text")
    val out = Valuation.leaveOneSourceOut(docs, "source", col("text"))
      .orderBy("source").collect()
    // N=5 docs, S=9 tokens; corpus mean = 1_800_000 micros
    val a = out(0)
    assert(a.getString(0) == "A" && a.getLong(1) == 2 && a.getLong(2) == 3)
    assert(a.getLong(3) == 1500000L) // 3e6/2
    assert(a.getLong(4) == 2000000L) // (9-3)e6/(5-2)
    assert(a.getLong(5) == 1800000L - 2000000L)
    assert(a.getLong(6) == 1L) // "x y" only in A; "shared" is not unique
    val c = out(2)
    assert(c.getString(0) == "C" && c.getLong(6) == 1L)
    assert(c.getLong(4) == (9L - 2L) * 1000000L / 4L)
  }

  test("leaveOneSourceOut: single-source corpus has NULL LOO columns") {
    val docs = Seq(("only", "a b"), ("only", "c")).toDF("source", "text")
    val r = Valuation.leaveOneSourceOut(docs, "source", col("text"))
      .collect()(0)
    assert(r.isNullAt(4) && r.isNullAt(5))
    assert(r.getLong(6) == 2L)
  }

  test("targetEncodeOof matches the closed form and NEVER sees the " +
      "row's own fold: changing one fold's targets leaves that " +
      "fold's encoding unchanged") {
    val k = 5
    val rows = Seq.tabulate(60) { i =>
      ("cat" + (i % 2), i.toLong, (i * 37 % 100).toLong - 20L)
    }
    val df = rows.toDF("c", "u", "cents")
    val enc = Sampling.targetEncodeOof(df, "c", col("u"), col("cents"), k)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(4)).toMap
    // closed-form replay in plain Scala
    val byCf = rows.groupBy(r => (r._1, Sampling.hashBucketLong(r._2, k)))
      .view.mapValues(rs => (rs.size.toLong, rs.map(_._3).sum)).toMap
    val byC = rows.groupBy(_._1)
      .view.mapValues(rs => (rs.size.toLong, rs.map(_._3).sum)).toMap
    byCf.foreach { case ((c, f), (ncf, scf)) =>
      val (nc, sc) = byC(c)
      val num = (sc - scf) * 1000000L
      val den = nc - ncf
      val exp = (num - math.floorMod(num, den)) / den
      assert(enc((c, f)) == exp, s"($c,$f)")
    }
    // leakage contract: perturb every target in fold 0 of cat0
    val perturbed = rows.map { case (c, u, v) =>
      if (c == "cat0" && Sampling.hashBucketLong(u, k) == 0L) (c, u, v + 999L)
      else (c, u, v)
    }.toDF("c", "u", "cents")
    val enc2 = Sampling
      .targetEncodeOof(perturbed, "c", col("u"), col("cents"), k)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(4)).toMap
    assert(enc2(("cat0", 0L)) == enc(("cat0", 0L)),
      "own-fold encoding must not depend on own-fold targets")
    assert(enc2.exists { case (key2, v) => key2._1 == "cat0" &&
      key2._2 != 0L && v != enc(key2) },
      "other folds must reflect the change")
  }

  test("all three are partitioning-invariant") {
    val docs = Tables.documents(spark, Sf0001)
    val a1 = Valuation.leaveOneSourceOut(docs, "source", col("text"))
    val a2 = Valuation.leaveOneSourceOut(docs.repartition(7), "source",
      col("text"))
    assert(a1.exceptAll(a2).isEmpty && a2.exceptAll(a1).isEmpty)
    val li = Tables.lineitem(spark, Sf0001)
    val cents = (col("l_extendedprice").cast("decimal(12,2)") * 100)
      .cast("long")
    val s1 = Skyline.pareto2d(li, "l_returnflag",
      col("l_quantity").cast("long"), cents)
    val s2 = Skyline.pareto2d(li.repartition(7), "l_returnflag",
      col("l_quantity").cast("long"), cents)
    assert(s1.exceptAll(s2).isEmpty && s2.exceptAll(s1).isEmpty)
    val ev = Tables.events(spark, Sf0001)
    val vc = (col("value").cast("decimal(12,2)") * 100).cast("long")
    val t1 = Sampling.targetEncodeOof(ev, "event_type", col("user_id"), vc, 5)
    val t2 = Sampling.targetEncodeOof(ev.repartition(7), "event_type",
      col("user_id"), vc, 5)
    assert(t1.exceptAll(t2).isEmpty && t2.exceptAll(t1).isEmpty)
  }
}
