package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.ScalarOps._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    *
    * Mirrors the reference's historical-training dataflow (SURVEY §3.1):
    * scan → clean → inner join → calendar featureize (pandas weekday
    * shim) → global min-max normalize of the measure — expressed as one
    * lazy Catalyst plan over orders ⋈ lineitem.
    */
  def entry(spark: SparkSession): DataFrame = {
    GraftSession.tune(spark)
    val dir = "/root/testdata/sf0.001"
    val o = Tables.orders(spark, dir)
    val li = Tables.lineitem(spark, dir)

    val joined = o
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .select(
        col("o_orderkey"),
        to_date(col("o_orderdate")).as("date"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("dom"),
        weekdayMon0(col("o_orderdate")).as("dow_mon0"),
        inDateList(to_date(col("o_orderdate")),
          Seq("1995-01-01", "1996-12-25")).as("is_holiday"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))

    val mm = joined.agg(min("revenue").as("mn"), max("revenue").as("mx"))
    joined
      .crossJoin(broadcast(mm))
      .withColumn("norm_revenue",
        (col("revenue") - col("mn")) / (col("mx") - col("mn")))
      .drop("mn", "mx")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.specs.map(sp => sp.name -> sp.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Queries.specs.flatMap(sp => sp.oracle.map(sp.name -> _)).toMap
}
