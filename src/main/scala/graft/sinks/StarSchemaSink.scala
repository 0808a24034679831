package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The serving star schema (SURVEY §2 K1–K3; DDL at
  * dags/utils.py:98-124):
  *
  *   weather(id PK, DateTime, WindSpeed, Temperature, Precipitation)
  *   traffic(id PK, date_id UNIQUE → weather.id, Intensity)
  *
  * The reference loads Postgres row-at-a-time with
  * `INSERT ... ON CONFLICT DO NOTHING` (one commit per row,
  * dags/utils.py:206-215/267-276) and resolves the FK with a
  * correlated subquery per row (:270). Spark rendering: set-based —
  * within-batch dedup, anti-join against existing natural keys, one
  * append; FK resolution is a single left join (J2). Backed by
  * parquet tables; the same logic drives a JDBC sink unchanged.
  *
  * Surrogate ids: `max(existing) + position in natural-key order`,
  * computed scale-safe — range-partition by the key, rank within each
  * partition, add broadcast prefix-sum offsets (never a global
  * single-partition window). Same dense SERIAL-like assignment at any
  * batch size.
  */
object StarSchemaSink {

  private def tablePath(warehouse: String, name: String) = s"$warehouse/$name"

  private def readIfExists(s: SparkSession, path: String): Option[DataFrame] =
    try {
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(path), s.sparkContext.hadoopConfiguration)
      if (fs.exists(new org.apache.hadoop.fs.Path(path)))
        Some(s.read.parquet(path))
      else None
    } catch { case _: Throwable => None }

  /** K1: create-if-not-exists — parquet tables materialize on first
    * append; this just pre-creates empty frames for introspection.
    */
  def createTables(s: SparkSession, warehouse: String): Unit = {
    import org.apache.spark.sql.types._
    val weatherSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("DateTime", TimestampType),
      StructField("WindSpeed", IntegerType),
      StructField("Temperature", IntegerType),
      StructField("Precipitation", BooleanType)))
    val trafficSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("date_id", LongType),
      StructField("Intensity", IntegerType)))
    Seq("weather" -> weatherSchema, "traffic" -> trafficSchema).foreach {
      case (name, schema) =>
        val path = tablePath(warehouse, name)
        if (readIfExists(s, path).isEmpty)
          s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
            .write.mode(SaveMode.Overwrite).parquet(path)
    }
  }

  /** K2 generalized: idempotent append with ON CONFLICT DO NOTHING
    * parity. `naturalKeys` mirror the DB uniqueness constraints
    * (weather.DateTime; traffic.date_id). Returns rows actually
    * appended.
    *
    * `rowKeys` (optional) is a FINER within-batch identity grain:
    * when the natural key is null for several genuinely distinct
    * rows (traffic.date_id after an unmatched FK resolve), deduping
    * on naturalKeys alone collapses them to one arbitrary survivor —
    * the reference's Postgres UNIQUE would insert each (NULLs never
    * conflict). With rowKeys set, within-batch dedup runs on
    * rowKeys, the anti-join stays on naturalKeys (null-safe — the
    * documented re-run idempotency divergence is unchanged), id
    * assignment orders by naturalKeys ++ rowKeys for determinism,
    * and rowKeys columns absent from the table schema drop before
    * the write.
    */
  def idempotentAppend(
      s: SparkSession,
      warehouse: String,
      table: String,
      batch: DataFrame,
      naturalKeys: Seq[String],
      rowKeys: Seq[String] = Nil): Long = {
    val path = tablePath(warehouse, table)
    val existing = readIfExists(s, path)
    val fresh = antiJoinExisting(batch, existing, naturalKeys, rowKeys)
    val maxId = existing
      .flatMap(ex => Option(ex.agg(max("id")).first().get(0)))
      .map(_.asInstanceOf[Long]).getOrElse(0L)
    val orderKeys = naturalKeys ++ rowKeys.filterNot(naturalKeys.contains)
    appendWithIds(s, fresh, orderKeys, maxId) { withIds =>
      val outCols = existing.map(_.columns.toSeq)
        .getOrElse("id" +: batch.columns.toSeq
          .filterNot(c => c == "id" ||
            (rowKeys.contains(c) && !naturalKeys.contains(c))))
      withIds.select(outCols.map(col): _*)
        .write.mode(SaveMode.Append).parquet(path)
    }
  }

  /** Within-batch dedup + anti-join against the existing table's
    * natural keys (the ON CONFLICT DO NOTHING half of K2, shared by
    * the parquet and JDBC sinks). Null-safe key comparison
    * throughout: Postgres UNIQUE treats NULLs as non-conflicting (a
    * null-FK row would re-insert on every run); we deliberately
    * diverge and treat null as a key value so the sink is fully
    * idempotent. Within-batch identity is `rowKeys` when given (so
    * distinct rows sharing a null natural key all survive — see
    * [[idempotentAppend]]), else naturalKeys.
    */
  private[sinks] def antiJoinExisting(
      batch: DataFrame,
      existing: Option[DataFrame],
      naturalKeys: Seq[String],
      rowKeys: Seq[String] = Nil): DataFrame = {
    // within-batch dedup first (the DB constraint would reject the
    // second row of a duplicate pair; dropDuplicates keeps one).
    val deduped =
      batch.dropDuplicates(if (rowKeys.nonEmpty) rowKeys else naturalKeys)
    existing match {
      case Some(ex) =>
        val exKeys = broadcast(
          ex.select(naturalKeys.map(k => col(k).as(s"__ex_$k")): _*))
        val cond = naturalKeys
          .map(k => deduped(k) <=> exKeys(s"__ex_$k"))
          .reduce(_ && _)
        deduped.join(exKeys, cond, "left_anti")
      case None => deduped
    }
  }

  /** Dense-sequential surrogate-id assignment + write (the SERIAL
    * half of K2, shared by the parquet and JDBC sinks): range-
    * partition by the natural key (partition i's keys all sort before
    * partition i+1's), rank WITHIN each partition, and add the prefix
    * sum of partition sizes — O(#partitions) driver rows, like any
    * job's task stats, never a global single-partition window. The
    * assignment is identical to a global row_number over the
    * natural-key order, and the same plan loads a dimension of any
    * size. Returns the appended row count; `write` runs only when
    * there is something to append.
    */
  private[sinks] def appendWithIds(
      s: SparkSession,
      fresh: DataFrame,
      orderKeys: Seq[String],
      maxId: Long)(write: DataFrame => Unit): Long = {
    val keyCols = orderKeys.map(col)
    val ranged = fresh.repartitionByRange(keyCols: _*)
      .withColumn("__pid", spark_partition_id()).cache()
    val sizes = ranged.groupBy("__pid").agg(count(lit(1)).as("__c"))
      .orderBy("__pid").collect()
    val n = sizes.map(_.getLong(1)).sum
    if (n > 0) {
      var cum = maxId
      val offsets = sizes.map { r =>
        val o = (r.getInt(0), cum); cum += r.getLong(1); o
      }.toSeq
      val offDf = broadcast(s.createDataFrame(offsets).toDF("__pid", "__off"))
      val wp = Window.partitionBy("__pid").orderBy(keyCols: _*)
      write(ranged
        .join(offDf, Seq("__pid"))
        .withColumn("id", row_number().over(wp).cast("long") + col("__off")))
    }
    ranged.unpersist()
    n
  }

  /** K3: FK-resolving traffic append — J2 left join replaces the
    * reference's per-row `(SELECT id FROM weather WHERE datetime=…)`;
    * a prediction whose DateTime has no weather row keeps a null
    * date_id (the reference would insert NULL too). Then K2 semantics
    * on the `date_id` unique key, with `DateTime` as the within-batch
    * row grain so DISTINCT unmatched predictions each insert their
    * own null-FK row instead of collapsing to one arbitrary survivor
    * (Postgres UNIQUE parity). Unmatched rows are reported on stderr
    * — a null FK in the fact table is a data-quality signal.
    */
  def appendTraffic(
      s: SparkSession,
      warehouse: String,
      predictions: DataFrame // columns: DateTime, Intensity
  ): Long = {
    val weatherDim = s.read.parquet(tablePath(warehouse, "weather"))
      .select(col("id").as("date_id"), col("DateTime"))
    val resolved = resolveTraffic(predictions, weatherDim, "parquet sink")
    idempotentAppend(s, warehouse, "traffic", resolved, Seq("date_id"),
      rowKeys = Seq("DateTime"))
  }

  /** Shared K3 resolve (parquet + JDBC sinks): dedup at the
    * prediction grain, broadcast-join the dim, warn on unmatched.
    * Keeps `DateTime` in the output — the sinks pass it as the
    * `rowKeys` grain and it drops before the physical write.
    */
  private[sinks] def resolveTraffic(
      predictions: DataFrame,
      weatherDim: DataFrame,
      who: String): DataFrame = {
    val resolved = predictions
      .dropDuplicates("DateTime")
      .join(broadcast(weatherDim), Seq("DateTime"), "left")
      .select("date_id", "Intensity", "DateTime")
    // Batch-sized count (predictions are serving batches, the join is
    // broadcast) — a null FK is a data-quality signal worth a line.
    val unmatched = resolved.filter(col("date_id").isNull).count()
    if (unmatched > 0)
      Console.err.println(
        s"[sink] appendTraffic ($who): $unmatched prediction(s) have no " +
          "weather row - inserting with null date_id (reference parity)")
    resolved
  }

  def readTable(s: SparkSession, warehouse: String, name: String): DataFrame =
    s.read.parquet(tablePath(warehouse, name))
}
