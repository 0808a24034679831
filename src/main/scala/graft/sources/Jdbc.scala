package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC source/sink (SURVEY §2 S6 + the Postgres load surface of
  * K1–K3). The reference talks to Postgres row-at-a-time via psycopg2
  * (dags/utils.py:54-86, 206-215); here the same tables are one
  * predicate-pushing JDBC scan / one batched JDBC append. Tested
  * against embedded Derby (ships with Spark); the dialect knobs are
  * the same for Postgres.
  */
object Jdbc {

  def props(extra: (String, String)*): Properties = {
    val p = new Properties()
    extra.foreach { case (k, v) => p.setProperty(k, v) }
    p
  }

  /** Predicate-pushing scan: `filter`/projection applied after this
    * are pushed into the remote query by Catalyst (PushedFilters on
    * the JDBCRelation).
    */
  def read(s: SparkSession, url: String, table: String): DataFrame =
    s.read.jdbc(url, table, props())

  /** Partition-parallel scan for big tables: numPartitions concurrent
    * remote cursors over ranges of partitionColumn — the way a
    * 1000-executor cluster drains a large JDBC table.
    */
  def readPartitioned(
      s: SparkSession,
      url: String,
      table: String,
      partitionColumn: String,
      lowerBound: Long,
      upperBound: Long,
      numPartitions: Int): DataFrame =
    s.read.jdbc(url, table, partitionColumn, lowerBound, upperBound,
      numPartitions, props())

  /** Batched append (vs the reference's one-commit-per-row loop):
    * rows buffer into `batchsize` inserts per round trip.
    */
  def append(df: DataFrame, url: String, table: String,
      batchSize: Int = 1000): Unit =
    df.write.mode(SaveMode.Append)
      .option("batchsize", batchSize.toString)
      .jdbc(url, table, props())

  def overwrite(df: DataFrame, url: String, table: String): Unit =
    df.write.mode(SaveMode.Overwrite).jdbc(url, table, props())

  /** K2 over JDBC: `INSERT ... ON CONFLICT DO NOTHING` parity against
    * a LIVE table (ref dags/utils.py:206-215, one commit per row) as
    * one set-based statement pair: scan the table's natural keys
    * (projection pushes down to the remote DB — the wire carries keys,
    * not rows), anti-join the deduped batch, append only what's new.
    * Null-safe key equality, like the parquet sink: a null key value
    * conflicts with itself, so re-runs are fully idempotent. Returns
    * rows actually appended — 0 on a re-run of the same payload.
    */
  def idempotentAppend(
      s: SparkSession,
      url: String,
      table: String,
      batch: DataFrame,
      naturalKeys: Seq[String],
      batchSize: Int = 1000): Long = {
    import org.apache.spark.sql.functions.{broadcast, col}
    val deduped = batch.dropDuplicates(naturalKeys)
    val existing =
      try Some(read(s, url, table)) catch { case _: Throwable => None }
    val fresh = existing match {
      case Some(ex) =>
        val exKeys = broadcast(
          ex.select(naturalKeys.map(k => col(k).as(s"__ex_$k")): _*))
        val cond = naturalKeys
          .map(k => deduped(k) <=> exKeys(s"__ex_$k"))
          .reduce(_ && _)
        deduped.join(exKeys, cond, "left_anti")
      case None => deduped
    }
    val toWrite = fresh.cache()
    val n = toWrite.count()
    if (n > 0) append(toWrite, url, table, batchSize)
    toWrite.unpersist()
    n
  }
}
