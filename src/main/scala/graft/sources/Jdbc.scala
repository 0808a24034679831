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
}
