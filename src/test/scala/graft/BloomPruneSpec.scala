package graft

import org.apache.spark.sql.functions._

import graft.operators.BloomPrune

class BloomPruneSpec extends SparkSpec {
  import spark.implicits._

  test("no false negatives: every build key passes its own filter") {
    val dim = Tables.part(spark, Sf001).filter($"p_size" === 1)
    val bits = BloomPrune.buildBits(dim, "p_partkey", mBits = 1 << 16)
    val misses = dim
      .filter(!BloomPrune.mightContain($"p_partkey", bits))
      .count()
    assert(misses == 0L)
  }

  test("pruned join == plain join, and the bloom actually prunes") {
    val fact = Tables.lineitem(spark, Sf001)
    val dim = Tables.part(spark, Sf001).filter($"p_size" === 1)
      .select("p_partkey", "p_brand")

    val pruned = BloomPrune.prunedJoin(fact, dim, "l_partkey", "p_partkey")
      .select("l_orderkey", "l_linenumber", "p_brand")
    val plain = fact.join(dim, $"l_partkey" === $"p_partkey")
      .select("l_orderkey", "l_linenumber", "p_brand")
    assert(pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty)

    // selectivity: 38/2000 parts ⇒ the probe must reject the vast
    // majority of fact rows before the join
    val bits = BloomPrune.buildBits(dim, "p_partkey")
    val total = fact.count()
    val pass = fact.filter(BloomPrune.mightContain($"l_partkey", bits)).count()
    assert(pass < total / 10, s"bloom passed $pass of $total")
  }

  test("false-positive rate stays near theory at tight m") {
    // 38 keys, m=2^12 bits, k=5 ⇒ theoretical fpp ≈ (1-e^{-kn/m})^k ≈ 2e-7;
    // use m=2^9 (512 bits) to force a measurable rate and check it stays
    // well under the trivial-accept regime.
    val dim = Tables.part(spark, Sf001).filter($"p_size" === 1)
    val bits = BloomPrune.buildBits(dim, "p_partkey", mBits = 512, k = 3)
    val keys = dim.select("p_partkey").as[Long].collect().toSet
    val nonMembers = Tables.part(spark, Sf001)
      .filter(!$"p_partkey".isin(keys.toSeq: _*))
    val fp = nonMembers
      .filter(BloomPrune.mightContain($"p_partkey", bits, k = 3)).count()
    val n = nonMembers.count()
    // (1-e^{-3*38/512})^3 ≈ 0.008 ⇒ expect ~16 of 1962; allow generous slack
    assert(fp.toDouble / n < 0.05, s"fpp ${fp.toDouble / n}")
  }

  test("probe plan is scan-side: filter sits under the join") {
    val fact = Tables.lineitem(spark, Sf001)
    val dim = Tables.part(spark, Sf001).filter($"p_size" === 1)
      .select("p_partkey", "p_brand")
    val plan = BloomPrune.prunedJoin(fact, dim, "l_partkey", "p_partkey")
      .queryExecution.executedPlan.toString
    // the native probe appears in a Filter, not in the join
    assert(plan.contains("bloom_contains"), plan.take(2000))
  }

  test("native probe == composed probe on every lineitem key") {
    val dim = Tables.part(spark, Sf001).filter($"p_size" === 1)
    val bits = BloomPrune.buildBits(dim, "p_partkey", mBits = 1 << 14, k = 5)
    val diff = Tables.lineitem(spark, Sf001)
      .select($"l_partkey",
        BloomPrune.mightContain($"l_partkey", bits).as("composed"),
        BloomPrune.mightContainNative($"l_partkey", bits).as("native"))
      .filter($"composed" =!= $"native")
      .count()
    assert(diff == 0L)
  }
}
