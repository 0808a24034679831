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
}
