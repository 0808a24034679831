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
    val w = df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, bucketCol)
    (if (sortWithinBuckets) w.sortBy(bucketCol) else w)
      .saveAsTable(table)
  }

  def table(s: SparkSession, name: String): DataFrame = s.table(name)
}
