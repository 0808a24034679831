package graft

import org.apache.spark.sql.functions._

import graft.sources.Jdbc

/** S6 JDBC surface against embedded Derby: batched write, scan with
  * predicate pushdown, partition-parallel read, and the decorrelated
  * FK-lookup join (J2) over JDBC tables.
  */
class JdbcSpec extends SparkSpec {

  lazy val url: String = {
    val dir = tmpDir("derby")
    s"jdbc:derby:$dir/graftdb;create=true"
  }

  test("batched append + scan round-trips orders") {
    val orders = Tables.orders(spark, Sf0001)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    Jdbc.overwrite(orders, url, "orders_jdbc")
    val back = Jdbc.read(spark, url, "orders_jdbc")
    assert(back.count() == orders.count())
    assert(back.schema.fieldNames.map(_.toLowerCase).toSet ==
      Set("o_orderkey", "o_custkey", "o_totalprice"))
  }

  test("filter pushes down into the JDBC scan") {
    val scan = Jdbc.read(spark, url, "orders_jdbc")
      .filter(col("o_totalprice") > 300000)
      .select("o_orderkey")
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("o_totalprice"), plan)
    val expected = Tables.orders(spark, Sf0001)
      .filter(col("o_totalprice") > 300000).count()
    assert(scan.count() == expected)
  }

  test("partition-parallel read splits into concurrent range cursors") {
    val maxKey = Tables.orders(spark, Sf0001)
      .agg(max("o_orderkey")).first().getLong(0)
    val df = Jdbc.readPartitioned(spark, url, "orders_jdbc",
      "o_orderkey", 0L, maxKey, numPartitions = 4)
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == Tables.orders(spark, Sf0001).count())
  }

  test("K2 over JDBC: idempotent append — re-run of same payload appends zero") {
    val batch = Tables.supplier(spark, Sf0001)
      .select("s_suppkey", "s_name", "s_nationkey")
    // first load: table does not exist yet -> everything appends
    Jdbc.overwrite(batch.limit(0), url, "supplier_jdbc") // create empty
    val n1 = Jdbc.idempotentAppend(spark, url, "supplier_jdbc", batch,
      Seq("s_suppkey"))
    assert(n1 == batch.count())
    // ON CONFLICT DO NOTHING parity: identical payload -> zero appended
    val n2 = Jdbc.idempotentAppend(spark, url, "supplier_jdbc", batch,
      Seq("s_suppkey"))
    assert(n2 == 0L)
    // overlapping horizon: half old + new keys -> only new rows append
    val shifted = batch.withColumn("s_suppkey", col("s_suppkey") + 1000000)
    val overlap = batch.limit(3).unionByName(shifted.limit(4))
    val n3 = Jdbc.idempotentAppend(spark, url, "supplier_jdbc", overlap,
      Seq("s_suppkey"))
    assert(n3 == 4L)
    val live = Jdbc.read(spark, url, "supplier_jdbc")
    assert(live.count() == batch.count() + 4)
    assert(live.select("s_suppkey").distinct().count() == live.count())
  }

  test("J2 over JDBC: FK-resolving left join replaces per-row subqueries") {
    val cust = Tables.customer(spark, Sf0001)
      .select("c_custkey", "c_mktsegment")
    Jdbc.overwrite(cust, url, "customer_jdbc")
    val joined = Jdbc.read(spark, url, "orders_jdbc")
      .join(broadcast(Jdbc.read(spark, url, "customer_jdbc")),
        col("o_custkey") === col("c_custkey"), "left")
    assert(joined.filter(col("c_mktsegment").isNull).count() == 0)
    assert(joined.count() == Tables.orders(spark, Sf0001).count())
  }
}
