package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew
import graft.sinks.Bucketed

/** Skew salting produces plain-join/plain-agg results with spread
  * partitioning; bucketed tables join without a shuffle.
  */
class SkewBucketSpec extends SparkSpec {
  import spark.implicits._

  // pathological skew: 90% of rows on one key
  lazy val skewed = spark.range(0, 100000)
    .select(
      when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id") % 100)
        .as("k"),
      (col("id") % 1000).cast("double").as("v"))

  test("salted aggregation equals plain aggregation") {
    val plain = skewed.groupBy("k")
      .agg(sum("v").as("sum_v"), count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), (r.getDouble(1), r.getLong(2)))).toMap
    val salted = Skew.saltedSumCount(skewed, Seq("k"), "v", salts = 8)
      .collect().map(r => (r.getLong(0), (r.getDouble(1), r.getLong(2)))).toMap
    assert(salted.keySet == plain.keySet)
    // v values are integer-valued doubles -> sums exact in any order
    assert(plain.forall { case (k, v) => salted(k) == v })
  }

  test("salted join equals plain join, keyed on (key, salt)") {
    val dim = Seq((7L, "hot"), (0L, "zero"), (10L, "ten"))
      .toDF("k", "name")
    val plain = skewed.join(dim, Seq("k")).groupBy("name")
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val salted = Skew.saltedJoin(skewed, dim, "k", salts = 8)
      .groupBy("name").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(salted == plain)
    assert(plain("hot") == 90000L)
  }

  test("bucketed fact-to-fact join plans without a shuffle") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Bucketed.write(Tables.orders(spark, Sf0001), "b_orders",
        "o_orderkey", 8)
      Bucketed.write(
        Tables.lineitem(spark, Sf0001)
          .withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem", "o_orderkey", 8)
      val joined = Bucketed.table(spark, "b_orders")
        .join(Bucketed.table(spark, "b_lineitem"), Seq("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
      assert(joined.count() == Tables.lineitem(spark, Sf0001).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
