package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Date-partitioned parquet lake — the at-scale landing layout
  * (SURVEY §4 "partition pruning" row: optional for the reference's
  * 8.6k rows, load-bearing at 100 TB).
  *
  * Layout: `<root>/<table>/p_date=YYYY-MM-DD/part-*.parquet`. A
  * reader filtering on `p_date` touches only matching directories
  * (PartitionFilters in the scan, zero row-groups read elsewhere);
  * the time-ordered feeds here (weather hours, forecast polls,
  * events) all query by date range, so the partition key IS the
  * access path. `maxRecordsPerFile` bounds file sizes; writes within
  * a partition are append-only, so a re-poll lands new files without
  * rewriting history (pair with the anti-join sink for exactly-once
  * rows).
  */
object PartitionedLake {

  def write(
      df: DataFrame,
      root: String,
      table: String,
      dateCol: String,
      mode: SaveMode = SaveMode.Append,
      maxRecordsPerFile: Long = 5000000L): Unit =
    df.withColumn("p_date", to_date(col(dateCol)))
      .write
      .mode(mode)
      .option("maxRecordsPerFile", maxRecordsPerFile.toString)
      .partitionBy("p_date")
      .parquet(s"$root/$table")

  def read(s: SparkSession, root: String, table: String): DataFrame =
    s.read.parquet(s"$root/$table")

  /** Date-range scan: Catalyst prunes to the matching p_date
    * directories before any file IO.
    */
  def readRange(
      s: SparkSession, root: String, table: String,
      fromDate: String, toDate: String): DataFrame =
    read(s, root, table)
      .filter(col("p_date") >= lit(fromDate) && col("p_date") <= lit(toDate))

  /** Bin-pack small files in selected partitions — the append-only
    * lake's maintenance pass. Every re-poll/micro-batch lands new
    * small files; at 100 TB the scan's task count (and the namenode's
    * metadata) is dominated by file count, so periodic compaction is
    * load-bearing, not cosmetic.
    *
    * Rewrites ONLY the partitions named (one directory overwrite
    * each, via dynamic partition overwrite — untouched dates keep
    * their files byte-identical), coalescing each partition to
    * ⌈rows/targetRowsPerFile⌉ files. Readers see either the old or
    * the new complete file set (parquet dir overwrite is
    * last-commit-wins; pair with date-scoped runs outside the live
    * ingest window).
    */
  /** SCD-1 upsert: rows in `batch` REPLACE existing rows with the same
    * natural key; new keys append. The write is partition-scoped —
    * only the p_date partitions the batch touches are rewritten
    * (dynamic partition overwrite merges surviving old rows with the
    * batch); the other 100 TB of history keeps its files
    * byte-identical. This is the MERGE-into-parquet pattern: at scale
    * the cost is proportional to the dirty partitions, never the
    * table.
    *
    * Assumes a row's natural key determines its date partition (true
    * for all feeds here: the key contains the timestamp) — a key can't
    * silently exist in a partition the batch doesn't touch.
    */
  def upsert(
      s: SparkSession,
      root: String,
      table: String,
      batch: DataFrame,
      dateCol: String,
      naturalKeys: Seq[String],
      targetRowsPerFile: Long = 5000000L): Unit = {
    // pinned: the batch feeds three actions (dates, key broadcast, the
    // write) — without this a nondeterministic input (limit/sample)
    // could delete one key set and write another
    val stamped = batch.withColumn("p_date", to_date(col(dateCol)))
      .localCheckpoint()
    val dates = stamped.select("p_date").distinct() // bounded: dates
      .collect().map(_.get(0).toString).toSeq
    if (dates.isEmpty) return
    val existing = read(s, root, table)
      .filter(col("p_date").isInCollection(dates))
    // null-safe key equality, like the idempotent sinks
    val keyCols = naturalKeys.map(k => col(k).as(s"__k_$k"))
    val batchKeys = broadcast(stamped.select(keyCols: _*).distinct())
    val survivors = existing.join(batchKeys,
      naturalKeys.map(k => existing(k) <=> batchKeys(s"__k_$k")).reduce(_ && _),
      "left_anti")
    val prev = s.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      survivors.unionByName(stamped.select(survivors.columns.map(col): _*))
        .write
        .mode(SaveMode.Overwrite)
        .option("maxRecordsPerFile", targetRowsPerFile.toString)
        .partitionBy("p_date")
        .parquet(s"$root/$table")
    } finally prev match {
      case Some(p) => s.conf.set("spark.sql.sources.partitionOverwriteMode", p)
      case None => s.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  /** Compliance hard-delete (the GDPR/right-to-be-forgotten pass):
    * physically remove every row matching `keys` and rewrite ONLY the
    * partitions that contained one. Unlike upsert, a deletion key
    * (e.g. a user id) names no date, so the dirty set is DISCOVERED
    * first with a column-pruned probe scan — the broadcast key
    * anti-probe reads just the key + p_date columns, never the wide
    * rows — and the rewrite cost is proportional to dirty partitions.
    * A partition whose rows are ALL deleted is removed at the
    * filesystem level (dynamic partition overwrite can't write an
    * empty partition, and leaving the old files is a compliance
    * failure, not a cosmetic one). Returns (rows deleted, dirty
    * partition values).
    */
  def delete(
      s: SparkSession,
      root: String,
      table: String,
      keys: DataFrame, // columns = naturalKeys
      naturalKeys: Seq[String],
      targetRowsPerFile: Long = 5000000L): (Long, Seq[String]) = {
    val keyCols = naturalKeys.map(k => col(k).as(s"__k_$k"))
    val delKeys = broadcast(keys.select(keyCols: _*).distinct()
      .localCheckpoint())
    val all = read(s, root, table)
    def matchCond(df: DataFrame) =
      naturalKeys.map(k => df(k) <=> delKeys(s"__k_$k")).reduce(_ && _)
    // probe: which partitions hold a doomed row (column-pruned scan)
    val dirty = all.select((naturalKeys :+ "p_date").map(col): _*)
      .join(delKeys, matchCond(all), "inner")
      .select("p_date").distinct()
      .collect().map(_.get(0).toString).toSeq
    if (dirty.isEmpty) return (0L, Nil)
    val existing = all.filter(col("p_date").isInCollection(dirty))
    val survivors = existing.join(delKeys, matchCond(existing), "left_anti")
      .localCheckpoint() // pinned: counted, date-probed, AND written
    val nDeleted = existing.count() - survivors.count()
    val keptDates = survivors.select("p_date").distinct()
      .collect().map(_.get(0).toString).toSet
    val prev = s.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      if (keptDates.nonEmpty)
        survivors.write
          .mode(SaveMode.Overwrite)
          .option("maxRecordsPerFile", targetRowsPerFile.toString)
          .partitionBy("p_date")
          .parquet(s"$root/$table")
    } finally prev match {
      case Some(p) => s.conf.set("spark.sql.sources.partitionOverwriteMode", p)
      case None => s.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    // fully-emptied partitions: no surviving rows to carry the
    // overwrite, so drop the directories explicitly
    val fs = org.apache.hadoop.fs.FileSystem.get(
      s.sparkContext.hadoopConfiguration)
    dirty.filterNot(keptDates).foreach { d =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$root/$table/p_date=$d"), true)
    }
    (nDeleted, dirty)
  }

  /** Incremental aggregate maintenance (the IVM pattern): keep a
    * per-key (n, sum_cents) aggregate table current under append-only
    * deltas WITHOUT recomputing history. The delta pre-aggregates per
    * key (map-side combined, delta-sized), full-outer-merges with the
    * stored aggregates of the AFFECTED hash-bucket partitions only,
    * and the additive combination rewrites just those buckets
    * (dynamic partition overwrite). Maintenance cost scales with the
    * delta, never with the accumulated table — on a 100 TB history
    * the nightly increment touches |delta| rows plus the buckets they
    * hash into. Sums are exact integers (cents), so N increments ≡
    * one full recompute, bit for bit, in any order.
    *
    * Layout: `<root>/<table>/p_bucket=<i>/…` with
    * p_bucket = the affine key hash mod `nBuckets` (same family as
    * every split/sample in the repo).
    */
  def mergeAdditive(
      s: SparkSession,
      root: String,
      table: String,
      delta: DataFrame,
      key: String,
      valueCents: org.apache.spark.sql.Column,
      nBuckets: Int = 64): Unit = {
    import graft.operators.Sampling
    val dAgg = delta
      .withColumn("__v", valueCents.cast("long"))
      .groupBy(col(key))
      .agg(count(lit(1)).as("n"), sum(col("__v")).as("sum_cents"))
      .withColumn("p_bucket", Sampling.hashBucket(col(key), nBuckets))
      .localCheckpoint() // pinned: feeds the bucket list AND the merge
    val buckets = dAgg.select("p_bucket").distinct()
      .collect().map(_.getLong(0).toString).toSeq // bounded by nBuckets
    if (buckets.isEmpty) return
    val dir = new java.io.File(s"$root/$table")
    val existing =
      if (dir.exists())
        read(s, root, table).filter(col("p_bucket").isInCollection(buckets))
      else
        s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          dAgg.schema)
    val e = existing.select(col(key).as("k0"), col("n").as("n0"),
      col("sum_cents").as("s0"))
    val merged = dAgg.join(e, col(key) <=> col("k0"), "full_outer")
      .select(
        coalesce(col(key), col("k0")).as(key),
        (coalesce(col("n"), lit(0L)) + coalesce(col("n0"), lit(0L))).as("n"),
        (coalesce(col("sum_cents"), lit(0L))
          + coalesce(col("s0"), lit(0L))).as("sum_cents"))
      .withColumn("p_bucket", Sampling.hashBucket(col(key), nBuckets))
    val prev = s.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try merged.write.mode(SaveMode.Overwrite)
      .partitionBy("p_bucket").parquet(s"$root/$table")
    finally prev match {
      case Some(p) => s.conf.set("spark.sql.sources.partitionOverwriteMode", p)
      case None => s.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  def compact(
      s: SparkSession,
      root: String,
      table: String,
      dates: Seq[String],
      targetRowsPerFile: Long = 5000000L): Unit = {
    val prev = s.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      read(s, root, table)
        .filter(col("p_date").isInCollection(dates))
        // one shuffle task per date ⇒ one file per date, except dates
        // past targetRowsPerFile, which the writer splits further
        .repartition(math.max(dates.size, 1), col("p_date"))
        .write
        .mode(SaveMode.Overwrite)
        .option("maxRecordsPerFile", targetRowsPerFile.toString)
        .partitionBy("p_date")
        .parquet(s"$root/$table")
    } finally prev match {
      case Some(p) => s.conf.set("spark.sql.sources.partitionOverwriteMode", p)
      case None => s.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }
}
