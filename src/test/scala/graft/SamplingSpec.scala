package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("hashSplit: weights land near target and partitioning never moves a row") {
    val docs = Tables.documents(spark, Sf001)
    val split = Sampling.hashSplit(docs, "doc_id",
      Seq("train" -> 80, "val" -> 10, "test" -> 10))
    val byName = split.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = docs.count().toDouble
    assert(byName.keySet == Set("train", "val", "test"))
    assert(math.abs(byName("train") / n - 0.8) < 0.06, byName)
    assert(math.abs(byName("val") / n - 0.1) < 0.05, byName)

    val a = split.select("doc_id", "split").collect().toSet
    val b = Sampling.hashSplit(docs.repartition(13), "doc_id",
      Seq("train" -> 80, "val" -> 10, "test" -> 10))
      .select("doc_id", "split").collect().toSet
    assert(a == b)
  }

  test("hashSplit: appending new rows never reassigns existing ones") {
    val docs = Tables.documents(spark, Sf001)
    val half = docs.filter($"doc_id" < 250)
    val w = Seq("train" -> 80, "val" -> 10, "test" -> 10)
    val before = Sampling.hashSplit(half, "doc_id", w)
      .select("doc_id", "split").collect().toSet
    val after = Sampling.hashSplit(docs, "doc_id", w)
      .filter($"doc_id" < 250).select("doc_id", "split").collect().toSet
    assert(before == after)
  }

  test("bernoulliSample: deterministic, near-fraction, pure filter") {
    val li = Tables.lineitem(spark, Sf001)
      .withColumn("__k", $"l_orderkey" * 8 + $"l_linenumber")
    val s1 = Sampling.bernoulliSample(li, "__k", 1, 10)
    val s2 = Sampling.bernoulliSample(li.repartition(7), "__k", 1, 10)
    val n = li.count().toDouble
    val k1 = s1.count()
    assert(math.abs(k1 / n - 0.1) < 0.02, s"$k1 of $n")
    assert(k1 == s2.count())
    // plan: a Filter over the scan, no Exchange
    val plan = s1.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(1500))
  }

  test("hash buckets are uniform-ish across 100 buckets") {
    val counts = spark.range(100000)
      .select(Sampling.hashBucket($"id", 100).as("b"))
      .groupBy("b").count().as[(Long, Long)].collect()
    assert(counts.length == 100)
    // each bucket expects 1000; chi-square-ish slack
    assert(counts.forall { case (_, c) => c > 800 && c < 1200 }, counts.minBy(_._2))
  }
}
