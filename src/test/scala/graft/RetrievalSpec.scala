package graft

import org.apache.spark.sql.functions._

import graft.operators.Retrieval

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  test("rrfFuse: hand-computed fixture — both-list docs beat single-list, " +
      "absent side contributes nothing, ties break on cid") {
    val dense = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3))
      .toDF("qid", "cid", "rank")
    val sparse = Seq((1L, 11L, 1), (1L, 13L, 2), (1L, 10L, 3))
      .toDF("qid", "cid", "rank")
    val got = Retrieval.rrfFuse(dense, sparse, k = 4).collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getInt(3)))
    // 11: 1/62 + 1/61 = .032525; 10: 1/61 + 1/63 = .032266;
    // 12: 1/63 = .015873; 13: 1/62 = .016129 → order 11, 10, 13, 12
    assert(got.map(_._1).toSeq == Seq(11L, 10L, 13L, 12L), got.toSeq)
    val expect11 = 1.0 / 62 + 1.0 / 61
    assert(math.abs(got.head._2 - expect11) < 1e-6)
    assert(got.map(_._3).toSeq == Seq(1, 2, 3, 4))
    // exact tie: same doc at the same rank in both lists twice over →
    // two docs with identical rrf order by cid
    val d2 = Seq((7L, 5L, 1), (7L, 3L, 2)).toDF("qid", "cid", "rank")
    val s2 = Seq((7L, 3L, 1), (7L, 5L, 2)).toDF("qid", "cid", "rank")
    val tied = Retrieval.rrfFuse(d2, s2, k = 2).collect()
      .map(r => (r.getLong(1), r.getInt(3)))
    assert(tied.toSeq == Seq((3L, 1), (5L, 2))) // equal rrf → cid order
  }

  test("bm25MoreLikeThis: self excluded, ranking partitioning-invariant") {
    val docs = Tables.documents(spark, Sf0001)
    val k = 10
    val a = Retrieval.bm25MoreLikeThis(docs, "doc_id", "text",
      col("doc_id") < 5, k).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(a.nonEmpty)
    assert(!a.exists(t => t._1 == t._2), "probe scored against itself")
    assert(a.groupBy(_._1).values.forall(_.length <= k))
    val b = Retrieval.bm25MoreLikeThis(docs.repartition(13), "doc_id",
      "text", col("doc_id") < 5, k).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(a.sortBy(t => (t._1, t._4)).toSeq == b.sortBy(t => (t._1, t._4)).toSeq)
  }

  test("irMetrics: hand-computed MRR/MAP/P@k fixture — perfect run, " +
      "partial run, zero-hit run") {
    // qrels: q1 → {10, 11}; q2 → {20, 21}; q3 → {30}
    val qrels = Seq((1L, 10L), (1L, 11L), (2L, 20L), (2L, 21L), (3L, 30L))
      .toDF("qid", "cid")
    // q1: perfect (10@1, 11@2) → RR=1, AP=1, P@2=1
    // q2: hits at ranks 2 and 4 → RR=1/2; AP = (1/2·1/2) + (2/4·1/2)
    //   = 1/4 + 1/4 (per-term floors: 250000 + 250000); P@2 = 1/2
    // q3: no hits → all zero
    val run = Seq(
      (1L, 10L, 1), (1L, 11L, 2), (1L, 99L, 3), (1L, 98L, 4),
      (2L, 90L, 1), (2L, 20L, 2), (2L, 91L, 3), (2L, 21L, 4),
      (3L, 77L, 1), (3L, 78L, 2)).toDF("qid", "cid", "rank")
    val got = Retrieval.irMetrics(run, qrels, pAt = 2)
      .orderBy("qid").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got(0) == ((1L, 1000000L, 1000000L, 1000000L)), got(0))
    assert(got(1) == ((2L, 500000L, 500000L, 500000L)), got(1))
    assert(got(2) == ((3L, 0L, 0L, 0L)), got(2))
  }

  test("ndcgAt: pinned discount table; perfect run scores 10⁶, " +
      "partial run the exact floor-div, zero-hit run 0") {
    import Retrieval.ndcgDiscountMicros
    // pin the table itself: ⌊10⁶ / log₂(r+1)⌋
    assert(ndcgDiscountMicros(1) == 1000000L)
    assert(ndcgDiscountMicros(2) == 630929L)
    assert(ndcgDiscountMicros(3) == 500000L)
    assert(ndcgDiscountMicros(4) == 430676L)
    val qrels = Seq((1L, 10L), (1L, 11L), (2L, 20L), (2L, 21L), (3L, 30L))
      .toDF("qid", "cid")
    val run = Seq(
      (1L, 10L, 1), (1L, 11L, 2), (1L, 99L, 3), (1L, 98L, 4),
      (2L, 90L, 1), (2L, 20L, 2), (2L, 91L, 3), (2L, 21L, 4),
      (3L, 77L, 1), (3L, 78L, 2)).toDF("qid", "cid", "rank")
    val got = Retrieval.ndcgAt(run, qrels, k = 4)
      .orderBy("qid").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val idcg2 = ndcgDiscountMicros(1) + ndcgDiscountMicros(2)
    // q1: hits at 1,2 of nrel=2 — perfect
    assert(got(0) == ((1L, idcg2, idcg2, 1000000L)), got(0))
    // q2: hits at 2,4 of nrel=2
    val dcg2 = ndcgDiscountMicros(2) + ndcgDiscountMicros(4)
    assert(got(1) ==
      ((2L, dcg2, idcg2, Math.floorDiv(dcg2 * 1000000L, idcg2))), got(1))
    assert(got(1)._4 == 650920L) // the exact floor, pinned
    // q3: no hits, nrel=1
    assert(got(2) == ((3L, 0L, 1000000L, 0L)), got(2))
  }
}
