package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed catalog tables: pre-shuffle once at write time, join
  * shuffle-free forever after. Two tables bucketed by the same key
  * into the same bucket count join with NO Exchange — at 100 TB this
  * turns the recurring fact⋈fact join from the dominant shuffle into
  * a local zip of co-located buckets. (Spark buckets live in the
  * catalog; `sortBy` within buckets also removes the Sort for SMJ.)
  */
object Bucketed {

  def write(
      df: DataFrame,
      table: String,
      bucketCol: String,
      buckets: Int,
      sortWithinBuckets: Boolean = true): Unit = {
    val s = df.sparkSession
    // A previous SESSION's managed-table dir can linger on disk with no
    // entry in this session's in-memory catalog; CREATE would then trip
    // LOCATION_ALREADY_EXISTS. Drop both the entry and the location.
    s.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      s.conf.get("spark.sql.warehouse.dir"), table)
    loc.getFileSystem(s.sparkContext.hadoopConfiguration).delete(loc, true)
    val w = df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, bucketCol)
    (if (sortWithinBuckets) w.sortBy(bucketCol) else w)
      .saveAsTable(table)
  }

  def table(s: SparkSession, name: String): DataFrame = s.table(name)
}
