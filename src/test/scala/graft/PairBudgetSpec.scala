package graft

import graft.operators.{Dedup, RangeJoin}
import org.apache.spark.sql.functions._
import org.scalatest.exceptions.TestFailedException

/** Pair-budget pre-flight gates (r13, VERDICT ask #5): the
  * materializing pair operators must DECLINE a run whose estimated
  * candidate mass exceeds a caller budget (the way the bench drift
  * gate declines a contended run), and the capped path must emit a
  * deterministic, documented prefix — never a silent truncation.
  */
class PairBudgetSpec extends SparkSpec {

  import spark.implicits._

  private lazy val docs = Tables.documents(spark, Sf0001)

  test("refusal: minhash declines when estimate exceeds budget") {
    val e = intercept[Dedup.PairBudgetExceeded] {
      Dedup.minhashNearDupsPolyBudgeted(
        docs, "doc_id", "text", pairBudget = 1L, refuse = true).count()
    }
    assert(e.estimated > 1L)
    assert(e.budget === 1L)
    assert(e.hottest.nonEmpty)
    assert(e.getMessage.contains("minhashNearDupsPolyBudgeted"))
  }

  test("refusal: a generous budget admits the run unchanged") {
    val full = Dedup.minhashNearDupsPoly(docs, "doc_id", "text")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val admitted = Dedup.minhashNearDupsPolyBudgeted(
        docs, "doc_id", "text", pairBudget = Long.MaxValue, refuse = true)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(admitted === full)
  }

  test("cap: output is a subset of the full pair set and deterministic") {
    val full = Dedup.minhashNearDupsPoly(docs, "doc_id", "text")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    def capped() = Dedup.minhashNearDupsPolyBudgeted(
        docs, "doc_id", "text", pairBudget = 50L, refuse = false)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val c1 = capped()
    assert(c1.subsetOf(full), "capped pairs must be a prefix of the full set")
    assert(c1 === capped(), "capped prefix must be deterministic")
    assert(c1.size < full.size, "budget 50 must actually drop buckets here")
  }

  test("refusal: editdist budget gate fires with the operator's name") {
    val e = intercept[Dedup.PairBudgetExceeded] {
      Dedup.editDistanceNearDupsBudgeted(
        docs, "doc_id", "text", pairBudget = 1L, refuse = true).count()
    }
    assert(e.getMessage.contains("editDistanceNearDupsBudgeted"))
  }

  test("refusal + cap: interval overlap") {
    val l = Seq((1L, 0L, 100L), (2L, 50L, 150L), (3L, 1000L, 1100L))
      .toDF("lid", "s1", "e1")
    val r = Seq((10L, 10L, 20L), (11L, 60L, 70L), (12L, 1050L, 1060L))
      .toDF("rid", "s2", "e2")
    val e = intercept[Dedup.PairBudgetExceeded] {
      RangeJoin.intervalOverlapBudgeted(
        l, r, "s1", "e1", "s2", "e2", bucket = 100L, pairBudget = 1L).count()
    }
    assert(e.estimated > 1L)
    val full = RangeJoin.intervalOverlap(
        l, r, "s1", "e1", "s2", "e2", bucket = 100L)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    val admitted = RangeJoin.intervalOverlapBudgeted(
        l, r, "s1", "e1", "s2", "e2", bucket = 100L,
        pairBudget = Long.MaxValue)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(admitted === full)
    val capped = RangeJoin.intervalOverlapBudgeted(
        l, r, "s1", "e1", "s2", "e2", bucket = 100L,
        pairBudget = 2L, refuse = false)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(capped.subsetOf(full))
    assert(capped.size < full.size)
  }

  test("calibration probe: print sf0.01 pair-mass estimates") {
    // informational — the catalog budget constants below must keep
    // the capped entries genuinely dropping buckets at the driver's
    // Verify scale (sf0.01)
    val d01 = Tables.documents(spark, Sf001)
    import graft.expressions.{MinHashSig, TextShingleHashes}
    val sh = d01.select(col("doc_id").as("id"),
      array_distinct(TextShingleHashes(col("text"), 3)).as("hs"))
      .withColumn("sig", MinHashSig.ofHashes(col("hs"), 64))
    val banded = sh.select(col("id"),
      explode(Dedup.lshBandKeysPoly(col("sig"), 16, 4)).as("bk"))
    val stats = banded.groupBy("bk").agg(count(lit(1)).as("cnt"))
      .withColumn("cand", when(col("cnt") <= 2000,
        expr("cnt * (cnt - 1) div 2")).otherwise(col("cnt") - 1))
    val total = stats.agg(sum("cand")).as[Long].first()
    val nBuckets = stats.count()
    info(s"sf0.01 minhash: est=$total buckets=$nBuckets")
    val ev = Tables.events(spark, Sf001)
      .withColumn("sec", unix_timestamp(col("ts")))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("sec").as("s1"),
        (col("sec") + 300).as("e1"))
    val er = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("e_id"), col("sec").as("s2"),
        (col("sec") + 300).as("e2"))
    val ist = RangeJoin.intervalOverlapPairStats(
      p, er, "s1", "e1", "s2", "e2", 300L)
    info(s"sf0.01 interval: est=${ist.agg(sum("cand")).as[Long].first()} " +
      s"buckets=${ist.count()}")
    assert(total > 0L)
  }
}
