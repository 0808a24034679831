package graft

import org.apache.spark.sql.functions._

import graft.operators.Sketch

/** Deterministic HLL (operators/Sketch): accuracy and — the property
  * that earns it an exact oracle — invariance under partitioning.
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("hll estimate within ~8% of exact at sf0.001 (m=256 → ~6.5% rse)") {
    val li = Tables.lineitem(spark, Sf0001)
    val est = Sketch.hllEstimate(li, Seq("l_returnflag"), "l_partkey")
    val exact = li.select("l_returnflag", "l_partkey").distinct()
      .groupBy("l_returnflag").agg(count(lit(1)).as("exact"))
    val rows = est.join(exact, Seq("l_returnflag")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val e = r.getAs[Long]("hll_est").toDouble
      val x = r.getAs[Long]("exact").toDouble
      assert(math.abs(e - x) / x < 0.08,
        s"${r.getString(0)}: hll=$e exact=$x")
    }
  }

  test("register state is partitioning-invariant (bitwise-equal estimates)") {
    val li = Tables.lineitem(spark, Sf0001)
    val a = Sketch.hllEstimate(li, Seq("l_returnflag"), "l_partkey")
      .orderBy("l_returnflag").collect().toSeq
    val b = Sketch.hllEstimate(li.repartition(17, col("l_partkey")),
        Seq("l_returnflag"), "l_partkey")
      .orderBy("l_returnflag").collect().toSeq
    assert(a == b)
  }

  test("hash60 spreads: 600 distinct keys hit >200 of 256 buckets") {
    val n = spark.range(600)
      .select(Sketch.hash60(col("id")).bitwiseAND(255).as("b"))
      .distinct().count()
    assert(n > 200, s"only $n buckets hit")
  }
}
