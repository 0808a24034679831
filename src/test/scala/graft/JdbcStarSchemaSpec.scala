package graft

import org.apache.spark.sql.functions._

import graft.sinks.{JdbcStarSink, StarSchemaSink}

/** K1–K3 over a LIVE JDBC database (embedded Derby) with the
  * hash-exact treatment q_k_star_readback gives the parquet path: the
  * SAME fixture-scale payload runs through both sinks, the fact⋈dim
  * readbacks must match value-for-value, and the second append of
  * everything must add zero rows — over JDBC, where the reference's
  * real sink (Postgres, dags/utils.py:199-276) lives.
  */
class JdbcStarSchemaSpec extends SparkSpec {

  test("JDBC star schema round trip ≡ parquet sink: DDL, double " +
      "idempotent append (2nd adds 0), FK-resolving traffic append " +
      "(2nd adds 0), readback value-identical") {
    val url = s"jdbc:derby:${tmpDir("derby-star")}/stardb;create=true"
    val wh = tmpDir("wh-star")
    JdbcStarSink.createTables(spark, url)
    JdbcStarSink.createTables(spark, url) // K1 re-run is a no-op
    StarSchemaSink.createTables(spark, wh)

    // the q_k_star_readback payload at sf0.001: hourly event rollup
    val hourly = Tables.events(spark, Sf0001)
      .groupBy(date_trunc("hour", col("ts")).as("DateTime"))
      .agg(max(col("user_id") % 30).cast("int").as("WindSpeed"),
        min(col("user_id") % 20).cast("int").as("Temperature"),
        (count(lit(1)) % 2 === 0).as("Precipitation"),
        count(lit(1)).cast("int").as("__n"))
      .localCheckpoint()
    val wb = hourly.select("DateTime", "WindSpeed", "Temperature",
      "Precipitation")
    val preds = hourly.select(col("DateTime"), col("__n").as("Intensity"))

    // JDBC path: K2 twice, K3 twice
    val j1 = JdbcStarSink.idempotentAppend(
      spark, url, "weather", wb, Seq("DateTime"))
    assert(j1 > 0L)
    assert(JdbcStarSink.idempotentAppend(
      spark, url, "weather", wb, Seq("DateTime")) == 0L,
      "2nd weather append over JDBC must add 0")
    val jt1 = JdbcStarSink.appendTraffic(spark, url, preds)
    assert(jt1 == j1)
    assert(JdbcStarSink.appendTraffic(spark, url, preds) == 0L,
      "2nd traffic append over JDBC must add 0")

    // parquet path: identical calls
    StarSchemaSink.idempotentAppend(spark, wh, "weather", wb, Seq("DateTime"))
    StarSchemaSink.appendTraffic(spark, wh, preds)

    // readback: fact⋈dim, both paths, value-identical row sets
    def readback(w: org.apache.spark.sql.DataFrame,
        t: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Int, Int, Boolean, Long, Int)] =
      t.join(w.select(col("id").as("date_id"), col("DateTime"),
          col("WindSpeed"), col("Temperature"), col("Precipitation")),
          Seq("date_id"))
        .select(col("date_id"), unix_timestamp(col("DateTime")).as("es"),
          col("WindSpeed"), col("Temperature"), col("Precipitation"),
          col("id"), col("Intensity"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3),
          r.getBoolean(4), r.getLong(5), r.getInt(6)))
        .sortBy(x => (x._1, x._6)).toSeq

    val viaJdbc = readback(
      JdbcStarSink.readTable(spark, url, "weather"),
      JdbcStarSink.readTable(spark, url, "traffic"))
    val viaParquet = readback(
      StarSchemaSink.readTable(spark, wh, "weather"),
      StarSchemaSink.readTable(spark, wh, "traffic"))
    assert(viaJdbc.nonEmpty)
    assert(viaJdbc == viaParquet,
      "JDBC and parquet star sinks must produce identical readbacks")
  }

  test("JDBC K3: missing weather timestamp keeps a null date_id and " +
      "stays idempotent (null conflicts with itself)") {
    import spark.implicits._
    val url = s"jdbc:derby:${tmpDir("derby-nullfk")}/nulldb;create=true"
    JdbcStarSink.createTables(spark, url)
    val w = Seq((java.sql.Timestamp.valueOf("2022-01-25 12:00:00"),
      12, 5, false))
      .toDF("DateTime", "WindSpeed", "Temperature", "Precipitation")
    JdbcStarSink.idempotentAppend(spark, url, "weather", w, Seq("DateTime"))
    val preds = Seq(
      (java.sql.Timestamp.valueOf("2022-01-25 12:00:00"), 7),
      (java.sql.Timestamp.valueOf("2099-01-01 00:00:00"), 3))
      .toDF("DateTime", "Intensity")
    assert(JdbcStarSink.appendTraffic(spark, url, preds) == 2L)
    assert(JdbcStarSink.appendTraffic(spark, url, preds) == 0L)
    val t = JdbcStarSink.readTable(spark, url, "traffic")
    assert(t.filter(col("date_id").isNull).count() == 1L)
    assert(t.filter(col("date_id") === 1L).count() == 1L)
  }

  test("JDBC K3: two DISTINCT unmatched DateTimes both insert null-FK " +
      "rows (Postgres UNIQUE parity - no within-batch collapse), " +
      "re-run adds 0") {
    import spark.implicits._
    val url = s"jdbc:derby:${tmpDir("derby-nullfk2")}/null2db;create=true"
    JdbcStarSink.createTables(spark, url)
    val w = Seq((java.sql.Timestamp.valueOf("2022-01-25 12:00:00"),
      12, 5, false))
      .toDF("DateTime", "WindSpeed", "Temperature", "Precipitation")
    JdbcStarSink.idempotentAppend(spark, url, "weather", w, Seq("DateTime"))
    val preds = Seq(
      (java.sql.Timestamp.valueOf("2022-01-25 12:00:00"), 7),
      (java.sql.Timestamp.valueOf("2099-01-01 00:00:00"), 3),
      (java.sql.Timestamp.valueOf("2100-06-15 08:00:00"), 5))
      .toDF("DateTime", "Intensity")
    assert(JdbcStarSink.appendTraffic(spark, url, preds) == 3L)
    val t = JdbcStarSink.readTable(spark, url, "traffic")
    assert(t.filter(col("date_id").isNull).count() == 2L,
      "both distinct unmatched predictions must survive over JDBC")
    assert(t.filter(col("date_id").isNull)
      .select("Intensity").as[Int].collect().sorted.toSeq == Seq(3, 5))
    assert(JdbcStarSink.appendTraffic(spark, url, preds) == 0L)
    assert(JdbcStarSink.readTable(spark, url, "traffic").count() == 3L)
  }
}
