package graft

import org.apache.spark.sql.functions._

import graft.operators.Decontaminate

class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  test("planted contamination is found; clean() drops exactly those docs") {
    val evals = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs")).toDF("eid", "etext")
    val docs = Seq(
      (10L, "prefix words then the quick brown fox jumps over something"),
      (11L, "totally unrelated text about spark partitions and shuffles"),
      (12L, "pack my box with five dozen liquor jugs verbatim plus tail"),
      (13L, "jumps over the lazy cat which is only a four gram match")).toDF("did", "dtext")

    val hits = Decontaminate.overlaps(
      docs, "did", "dtext", evals, "eid", "etext", w = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // doc 10 shares "the quick brown fox jumps" (5-gram) with eval 1;
    // doc 12 shares several 5-grams with eval 2; doc 13's longest match
    // with eval 1 is "jumps over the lazy" — 4 tokens, under w=5;
    // doc 11 shares nothing.
    assert(hits.map(_._1) == Set(10L, 12L), hits)

    val kept = Decontaminate.clean(
      docs, "did", "dtext", evals, "eid", "etext", w = 5)
      .select("did").as[Long].collect().toSet
    assert(kept == Set(11L, 13L))
  }

  test("overlap count equals the number of distinct shared w-grams") {
    val evals = Seq((1L, "a b c d e f")).toDF("eid", "etext")
    val docs = Seq((10L, "a b c d e f")).toDF("did", "dtext")
    // 3 distinct 4-grams in a 6-token text, all shared
    val r = Decontaminate.overlaps(
      docs, "did", "dtext", evals, "eid", "etext", w = 4)
      .collect()
    assert(r.length == 1 && r.head.getAs[Long]("n_shared") == 3L)
  }

  test("corpus side never shuffles: eval shingles broadcast") {
    val all = Tables.documents(spark, Sf001)
    val plan = Decontaminate.overlaps(
      all.filter($"doc_id" >= 25), "doc_id", "text",
      all.filter($"doc_id" < 25), "doc_id", "text", w = 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    // the only Exchange below the join boundary is the broadcast one;
    // the corpus reaches the join without a shuffle exchange
    val joinIdx = plan.indexOf("BroadcastHashJoin")
    val below = plan.substring(joinIdx)
    assert(!below.contains("Exchange hashpartitioning"), below.take(2000))
  }
}
