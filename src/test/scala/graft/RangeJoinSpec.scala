package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

/** Overlap-bucketed range join vs the direct inequality join. */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def check(
      pts: Seq[Long],
      ivs: Seq[(Long, Long)],
      bucket: Long): Unit = {
    val points = pts.zipWithIndex.map { case (p, i) => (i.toLong, p) }
      .toDF("pid", "p")
    val intervals = ivs.zipWithIndex.map { case ((s, e), i) => (i.toLong, s, e) }
      .toDF("iid", "s", "e")
    val got = RangeJoin.pointInInterval(points, intervals, "p", "s", "e", bucket)
      .select("iid", "pid").as[(Long, Long)].collect().sorted.toSeq
    val want = intervals.join(points, col("p") >= col("s") && col("p") < col("e"))
      .select("iid", "pid").as[(Long, Long)].collect().sorted.toSeq
    assert(got == want, s"bucket=$bucket")
  }

  test("random points and intervals match the inequality join, several widths") {
    val rnd = new Random(42)
    val pts = Seq.fill(500)(rnd.nextLong(10000))
    val ivs = Seq.fill(200) {
      val s = rnd.nextLong(10000); (s, s + 1 + rnd.nextLong(700))
    }
    for (w <- Seq(1L, 7L, 300L, 5000L)) check(pts, ivs, w)
  }

  test("boundary semantics: start inclusive, end exclusive, bucket edges") {
    // points sitting exactly on bucket and interval boundaries
    check(Seq(0L, 299L, 300L, 301L, 599L, 600L), Seq((300L, 600L)), 300L)
    check(Seq(-301L, -300L, -1L, 0L, 1L), Seq((-300L, 1L)), 300L)
  }

  test("empty sides produce empty results") {
    check(Seq.empty, Seq((0L, 10L)), 5L)
    check(Seq(1L, 2L), Seq.empty, 5L)
  }

  test("each matching pair appears exactly once (no bucket-overlap dups)") {
    val points = Seq((1L, 450L)).toDF("pid", "p")
    val intervals = Seq((1L, 0L, 1000L)).toDF("iid", "s", "e") // spans 4 buckets
    val n = RangeJoin.pointInInterval(points, intervals, "p", "s", "e", 300L).count()
    assert(n == 1L)
  }

  test("physical plan is a hash/merge equi join — no nested-loop, no cartesian") {
    val points = Seq((1L, 5L)).toDF("pid", "p")
    val intervals = Seq((1L, 0L, 10L)).toDF("iid", "s", "e")
    val plan = RangeJoin.pointInInterval(points, intervals, "p", "s", "e", 300L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      plan)
  }

  private def checkOverlap(
      as: Seq[(Long, Long)], bs: Seq[(Long, Long)], bucket: Long): Unit = {
    val l = as.zipWithIndex.map { case ((s, e), i) => (i.toLong, s, e) }
      .toDF("aid", "s1", "e1")
    val r = bs.zipWithIndex.map { case ((s, e), i) => (i.toLong, s, e) }
      .toDF("bid", "s2", "e2")
    val got = RangeJoin.intervalOverlap(l, r, "s1", "e1", "s2", "e2", bucket)
      .select("aid", "bid").as[(Long, Long)].collect().sorted.toSeq
    val want = l.join(r, col("s1") < col("e2") && col("s2") < col("e1"))
      .select("aid", "bid").as[(Long, Long)].collect().sorted.toSeq
    assert(got == want, s"bucket=$bucket")
  }

  test("interval overlap: random intervals match the inequality join, " +
      "several widths; each pair exactly once") {
    val rnd = new Random(7)
    val as = Seq.fill(300) {
      val s = rnd.nextLong(10000); (s, s + 1 + rnd.nextLong(900))
    }
    val bs = Seq.fill(300) {
      val s = rnd.nextLong(10000); (s, s + 1 + rnd.nextLong(200))
    }
    for (w <- Seq(1L, 13L, 300L, 5000L)) checkOverlap(as, bs, w)
  }

  test("interval overlap boundary semantics: touching intervals do NOT " +
      "overlap (half-open), containment and identity do") {
    // [0,300) vs [300,600): touch at 300 — no match
    checkOverlap(Seq((0L, 300L)), Seq((300L, 600L)), 300L)
    // identical, nested, and straddling-bucket-edge intervals
    checkOverlap(
      Seq((0L, 300L), (100L, 200L), (250L, 950L)),
      Seq((0L, 300L), (0L, 1000L), (299L, 300L), (899L, 901L)), 300L)
    // negative domain
    checkOverlap(Seq((-600L, -300L)), Seq((-301L, -299L), (-300L, 0L)), 300L)
  }

  test("interval overlap plan: equi join on the bucket, no nested loop") {
    val l = Seq((1L, 0L, 10L)).toDF("aid", "s1", "e1")
    val r = Seq((1L, 5L, 15L)).toDF("bid", "s2", "e2")
    val plan = RangeJoin.intervalOverlap(l, r, "s1", "e1", "s2", "e2", 300L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      plan)
  }
}
