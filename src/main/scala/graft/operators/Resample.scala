package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: project an irregular event stream onto
  * a fixed-step grid and forward-fill the gaps — the pandas
  * `resample().ffill()` of the reference's hourly weather/traffic
  * world, rebuilt as one declarative plan.
  *
  * Scale shape: the per-bucket aggregation is the only fact-sized
  * shuffle (map-side combined, keyed by (series, bucket)). The grid
  * spine is |series| × |span/step| rows — metadata-scale next to the
  * events — built from a broadcast grand agg (min/max bucket) with no
  * driver action, and the forward-fill window partitions BY SERIES,
  * so fill parallelism is the series count (the normal shape: many
  * series, bounded span each). A single years-long series would
  * serialize its fill; that variant wants the segmented prefix trick
  * (bucket ranges → per-range last → cross-range carry), same as the
  * positional-split design note.
  */
object Resample {

  /** `secCol` = event time in epoch seconds; `valueCents` = an
    * integer-valued measure (exact cents — keeps every sum
    * partitioning-invariant and oracle-replayable). Output per
    * (series key, bucket): observation count, observed flag, and the
    * forward-filled cents sum (null until the series' first
    * observation).
    */
  def gridFfill(
      events: DataFrame,
      keyCol: String,
      secCol: Column,
      valueCents: Column,
      stepSec: Long): DataFrame = {
    val bucketed = events.withColumn("bucket",
      floor(secCol / lit(stepSec)).cast("long"))
    val agg = bucketed.groupBy(col(keyCol), col("bucket"))
      .agg(count(lit(1)).as("n"), sum(valueCents).as("v_cents"))
    val span = agg.agg(min("bucket").as("lo"), max("bucket").as("hi"))
    val grid = span.select(explode(sequence(col("lo"), col("hi"))).as("bucket"))
    val spine = agg.select(keyCol).distinct().crossJoin(broadcast(grid))
    val w = Window.partitionBy(keyCol).orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(agg, Seq(keyCol, "bucket"), "left")
      .withColumn("observed", col("v_cents").isNotNull)
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .withColumn("filled_cents", last("v_cents", ignoreNulls = true).over(w))
      .select(col(keyCol), col("bucket"), col("n"), col("observed"),
        col("filled_cents"))
  }
}
