package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch perf harness (not part of the library surface): times plan
  * variants of the slowest bench queries at sf0.1.
  */
object Scratch {
  def time(label: String)(f: => DataFrame): Unit = {
    val times = (1 to 4).map { _ =>
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[scratch] $label%-28s min=${times.min}%.3f runs=${times.map(t => f"$t%.2f").mkString(",")}")
  }

  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.tune(spark)
    Tables.lineitem(spark, d).limit(10).write.format("noop").mode("overwrite").save()

    // ---- current experiment (edit freely) ----
    {
      import graft.operators.IpOps
      val h = (pmod(col("event_id"), lit(1000000007L)) * 69069L + 12345L) %
        1000000007L
      val ip0 = lit(167772160L) + h % 16777216L
      val ipStr = IpOps.longToIpv4(ip0)
      val rules = Seq(
        IpOps.parseCidr("10.0.0.0/8", "corp"),
        IpOps.parseCidr("10.64.0.0/10", "blockA"),
        IpOps.parseCidr("10.96.0.0/11", "blockB"),
        IpOps.parseCidr("10.112.0.0/12", "blockC"),
        IpOps.parseCidr("10.120.0.0/13", "blockD"))
      def ev = Tables.events(spark, d)
      time("ip0 only") { ev.select(col("event_id"), ip0.as("ip")) }
      time("ipStr only") { ev.select(col("event_id"), ipStr.as("s")) }
      time("parse(ipStr)") {
        ev.select(col("event_id"), IpOps.ipv4ToLong(ipStr).as("ip")) }
      time("parse(materialized str)") {
        ev.select(col("event_id"), ipStr.as("s"))
          .select(col("event_id"), IpOps.ipv4ToLong(col("s")).as("ip")) }
      time("lookup on ip0 (no parse)") {
        IpOps.cidrLookupJoin(
          ev.select(col("event_id"), ip0.as("ip")), "ip", rules) }
      time("full entry") {
        Queries.specs.find(_.name == "q_u_cidr_lookup").get.fn(spark, d) }
    }
    spark.stop()
  }
}
