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

  test("AQE splits the skewed join partition at runtime (skew=true)") {
    // the runtime complement to manual salting: with thresholds scaled
    // to the fixture, AQE detects the hot key's oversized partition in
    // the sort-merge join and splits it — no code changes to the query
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // right side deliberately UNskewed (20 rows/key): the hot key's
      // blowup is left-partition size, the thing AQE's detector sees
      val right = spark.range(0, 2000)
        .select((col("id") % 100).as("k"), col("id").as("rid"))
      // tiny aggregate on top so collect() is the SQL-path action that
      // finalizes THIS AdaptiveSparkPlan (the .rdd/.foreach path never
      // updates the executedPlan string; a .write plans a fresh QE)
      val agg = skewed.join(right, Seq("k")).agg(sum("v"), count(lit(1)))
      agg.collect()
      val plan = agg.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), plan.take(3000))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
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
