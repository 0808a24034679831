package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}

/** Deterministic scale-up of the driver testdata: replicate every
  * table `factor`× with key-domain shifts that preserve referential
  * integrity (replica i shifts each key family by i·(maxKey+1), so
  * lineitem rows keep pointing at their replica's orders/part/
  * supplier rows, orders at their customer, etc.). Dimension tables
  * that are fixed-cardinality in the schema (nation, region) copy
  * unshifted.
  *
  * Text/embedding payloads replicate UNCHANGED on purpose: the result
  * is a duplicate-heavy corpus — every document gains factor−1 exact
  * copies — which is the WORST case for the dedup/near-dup family
  * (every LSH band bucket gains factor× occupancy) and therefore the
  * honest stress profile for the hot-bucket caps and the CC round
  * bound. BASELINE.md §6 records the measured scaling.
  *
  * Usage: runMain graft.tools.ScaleData <srcSfDir> <outDir> <factor>
  */
object ScaleData {

  def main(args: Array[String]): Unit = {
    val Array(src, out, fStr) = args
    val factor = fStr.toInt
    val spark = GraftSession.local("scale-data")
    scaleAll(spark, src, out, factor)
    spark.stop()
  }

  def scaleAll(spark: SparkSession, src: String, out: String, factor: Int): Unit = {
    def maxOf(df: DataFrame, c: String): Long =
      df.agg(max(col(c))).first().getLong(0) + 1L

    val orders = Tables.orders(spark, src)
    val customer = Tables.customer(spark, src)
    val part = Tables.part(spark, src)
    val supplier = Tables.supplier(spark, src)
    val documents = Tables.documents(spark, src)
    val embeddings = Tables.embeddings(spark, src)
    val events = spark.read.parquet(s"$src/events.parquet")

    val okBase = maxOf(orders, "o_orderkey")
    val ckBase = maxOf(customer, "c_custkey")
    val pkBase = maxOf(part, "p_partkey")
    val skBase = maxOf(supplier, "s_suppkey")
    val dkBase = maxOf(documents, "doc_id")
    val vkBase = maxOf(embeddings, "vec_id")
    val ekBase = maxOf(events, "event_id")
    val ukBase = maxOf(events, "user_id")

    /** factor-way union with the named key columns shifted per replica. */
    def rep(df: DataFrame, shifts: Map[String, Long]): DataFrame =
      (0 until factor).map { i =>
        shifts.foldLeft(df) { case (d, (c, base)) =>
          d.withColumn(c, col(c) + lit(base * i))
        }
      }.reduce(_ unionByName _)

    def write(df: DataFrame, name: String): Unit =
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")

    write(rep(Tables.lineitem(spark, src), Map(
      "l_orderkey" -> okBase, "l_partkey" -> pkBase, "l_suppkey" -> skBase)),
      "lineitem")
    write(rep(orders, Map("o_orderkey" -> okBase, "o_custkey" -> ckBase)),
      "orders")
    write(rep(customer, Map("c_custkey" -> ckBase)), "customer")
    write(rep(part, Map("p_partkey" -> pkBase)), "part")
    write(rep(supplier, Map("s_suppkey" -> skBase)), "supplier")
    write(rep(documents, Map("doc_id" -> dkBase)), "documents")
    write(rep(embeddings, Map("vec_id" -> vkBase)), "embeddings")
    // events.ts may surface as ns-long; replicate ids, keep timestamps
    write(rep(events.drop("ts_ns", "ts_sec"),
      Map("event_id" -> ekBase, "user_id" -> ukBase)), "events")
    spark.read.parquet(s"$src/nation.parquet").write
      .mode("overwrite").parquet(s"$out/nation.parquet")
    spark.read.parquet(s"$src/region.parquet").write
      .mode("overwrite").parquet(s"$out/region.parquet")
  }
}
