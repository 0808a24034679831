package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Jdbc

/** The serving star schema over a LIVE JDBC database — the
  * reference's actual sink is Postgres (DDL at dags/utils.py:98-124,
  * row-at-a-time ON CONFLICT loads at :206-215/:267-276); this is the
  * same K1–K3 surface as [[StarSchemaSink]] with the storage swapped:
  * real CREATE TABLE DDL, batched JDBC appends, and the identical
  * set-based idempotency + surrogate-id logic (shared helpers — the
  * two sinks cannot drift). Tested against embedded Derby; the
  * dialect knobs are the same for Postgres.
  *
  * Scale shape: the anti-join scans only the natural-key PROJECTION
  * of the remote table (pushed down — the wire carries keys, not
  * rows), the id high-water mark is one remote MAX, and the append is
  * batched inserts. The FK resolve broadcasts the weather dimension
  * exactly like the parquet sink.
  */
object JdbcStarSink {

  /** K1: CREATE TABLE (id + natural columns) if absent. Derby has no
    * IF NOT EXISTS — the already-exists SQLState (X0Y32) is the
    * exists check, everything else propagates.
    */
  def createTables(s: SparkSession, url: String): Unit = {
    val ddl = Seq(
      """CREATE TABLE weather (
        |  id BIGINT NOT NULL PRIMARY KEY,
        |  "DateTime" TIMESTAMP,
        |  "WindSpeed" INTEGER,
        |  "Temperature" INTEGER,
        |  "Precipitation" BOOLEAN)""".stripMargin,
      """CREATE TABLE traffic (
        |  id BIGINT NOT NULL PRIMARY KEY,
        |  date_id BIGINT,
        |  "Intensity" INTEGER)""".stripMargin)
    val conn = java.sql.DriverManager.getConnection(url)
    try ddl.foreach { stmt =>
      try { val st = conn.createStatement(); try st.execute(stmt)
            finally st.close() }
      catch {
        case e: java.sql.SQLException if e.getSQLState == "X0Y32" => ()
      }
    } finally conn.close()
  }

  /** K2 over JDBC with surrogate ids: same dedup + null-safe
    * anti-join + dense-sequential id assignment as the parquet sink
    * (shared [[StarSchemaSink.antiJoinExisting]] /
    * [[StarSchemaSink.appendWithIds]]), the write going out as
    * batched inserts. Returns rows actually appended — 0 on a re-run
    * of the same payload.
    */
  def idempotentAppend(
      s: SparkSession,
      url: String,
      table: String,
      batch: DataFrame,
      naturalKeys: Seq[String],
      batchSize: Int = 1000): Long = {
    val existing = Jdbc.read(s, url, table)
    val fresh = StarSchemaSink.antiJoinExisting(
      batch, Some(existing), naturalKeys)
    val maxId = Option(existing.agg(max("id")).first().get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L)
    StarSchemaSink.appendWithIds(s, fresh, naturalKeys, maxId) { withIds =>
      Jdbc.append(
        withIds.select(existing.columns.map(col).toIndexedSeq: _*),
        url, table, batchSize)
    }
  }

  /** K3 over JDBC: FK-resolving traffic append — one broadcast left
    * join against the live weather dimension replaces the reference's
    * per-row correlated subquery (dags/utils.py:270), then K2
    * semantics on the date_id unique key.
    */
  def appendTraffic(
      s: SparkSession,
      url: String,
      predictions: DataFrame // columns: DateTime, Intensity
  ): Long = {
    val weatherDim = Jdbc.read(s, url, "weather")
      .select(col("id").as("date_id"), col("DateTime"))
    val resolved = predictions
      .join(broadcast(weatherDim), Seq("DateTime"), "left")
      .select("date_id", "Intensity")
    idempotentAppend(s, url, "traffic", resolved, Seq("date_id"))
  }

  def readTable(s: SparkSession, url: String, name: String): DataFrame =
    Jdbc.read(s, url, name)
}
