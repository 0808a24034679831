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

  /** Linear interpolation on the same grid spine as [[gridFfill]] —
    * the pandas `resample().interpolate()` face: each unobserved
    * bucket takes pv + (nv−pv)·(bucket−pb)/(nb−pb) between its
    * surrounding observations, as an EXACT integer floor (decimal
    * numerator past the long bound, pmod-floor division) — so the
    * fill is order-free and oracle-replayable, unlike a float lerp.
    * Buckets before the first / after the last observation stay NULL
    * (no extrapolation — ffill is the operator for trailing carry).
    * Same scale shape as gridFfill: one fact-sized bucket agg, a
    * metadata spine, windows partitioned BY SERIES; the prev/next
    * observation pair rides two ignoreNulls window picks over the
    * same sort.
    */
  def gridInterpolate(
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
    val wPrev = Window.partitionBy(keyCol).orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(keyCol).orderBy("bucket")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    spine.join(agg, Seq(keyCol, "bucket"), "left")
      .withColumn("observed", col("v_cents").isNotNull)
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .withColumn("obs", when(col("v_cents").isNotNull,
        struct(col("bucket").as("b"), col("v_cents").as("v"))))
      .withColumn("p", last("obs", ignoreNulls = true).over(wPrev))
      .withColumn("nx", first("obs", ignoreNulls = true).over(wNext))
      // strictly-between geometry for unobserved rows ⇒ den ≥ 1;
      // numerator in decimal: (value span)·(bucket offset) can pass
      // the long bound on wide gaps of large cents
      .withColumn("den", col("nx.b") - col("p.b"))
      .withColumn("num",
        (col("nx.v").cast("decimal(38,0)") - col("p.v"))
          * (col("bucket") - col("p.b")))
      .withColumn("interp_cents",
        when(col("observed"), col("v_cents"))
          .otherwise(when(col("p").isNotNull && col("nx").isNotNull,
            col("p.v")
              + expr("(num - (((num % den) + den) % den)) div den"))
            .cast("long")))
      .select(col(keyCol), col("bucket"), col("n"), col("observed"),
        col("interp_cents"))
  }

  /** [[gridFfill]] for the degenerate shape it documents as its
    * limit: ONE (or few) giant series, where a per-series window
    * would serialize the whole fill into a single task. The classic
    * segmented-prefix decomposition: split the bucket span into
    * `nRanges` contiguous ranges, compute each range's LAST observed
    * value (a tiny keys×ranges table), prefix-carry across ranges on
    * that small table only, then fill within each (series, range)
    * window — parallelism nRanges per series instead of 1.
    * Value-identical to gridFfill (ResampleSpec proves it row for
    * row); the fact-sized work never sees a partition wider than one
    * range.
    */
  def gridFfillSegmented(
      events: DataFrame,
      keyCol: String,
      secCol: Column,
      valueCents: Column,
      stepSec: Long,
      nRanges: Int = 32): DataFrame = {
    val bucketed = events.withColumn("bucket",
      floor(secCol / lit(stepSec)).cast("long"))
    val agg = bucketed.groupBy(col(keyCol), col("bucket"))
      .agg(count(lit(1)).as("n"), sum(valueCents).as("v_cents"))
    val span = agg.agg(min("bucket").as("lo"), max("bucket").as("hi"))
    // contiguous range id: floor((bucket-lo)·R / (span+1)) ∈ [0, R)
    def rangeId(b: Column): Column =
      floor((b - col("lo")).cast("double") * nRanges
        / (col("hi") - col("lo") + lit(1L)).cast("double")).cast("int")
    val withR = agg.crossJoin(broadcast(span))
      .withColumn("rid", rangeId(col("bucket")))
    // per-(series, range) last observation — keys×ranges rows, tiny
    val rangeLast = withR.groupBy(col(keyCol), col("rid"))
      .agg(max(struct(col("bucket"), col("v_cents"))).as("m"))
      .select(col(keyCol), col("rid"), col("m.v_cents").as("range_last"))
    // carry into each range = last observation of any EARLIER range.
    // Every (series, rid) needs a row — a range with no observation
    // must still inherit the carry — so the window runs over the
    // keys×ranges spine (tiny table, never the fact).
    val ridSpine = agg.select(keyCol).distinct()
      .crossJoin(broadcast(
        span.select(explode(sequence(lit(0), lit(nRanges - 1))).as("rid"))))
    val carries = ridSpine
      .join(rangeLast, Seq(keyCol, "rid"), "left")
      .withColumn("carry_in",
        last("range_last", ignoreNulls = true).over(
          Window.partitionBy(keyCol).orderBy("rid")
            .rowsBetween(Window.unboundedPreceding, -1)))
      .select(col(keyCol), col("rid"), col("carry_in"))
    val grid = span.select(col("lo"), col("hi"),
        explode(sequence(col("lo"), col("hi"))).as("bucket"))
      .withColumn("rid", rangeId(col("bucket")))
      .select("bucket", "rid")
    val spine = agg.select(keyCol).distinct().crossJoin(broadcast(grid))
    val wFill = Window.partitionBy(col(keyCol), col("rid")).orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(agg, Seq(keyCol, "bucket"), "left")
      .join(broadcast(carries), Seq(keyCol, "rid"), "left")
      .withColumn("observed", col("v_cents").isNotNull)
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .withColumn("filled_cents",
        coalesce(last("v_cents", ignoreNulls = true).over(wFill),
          col("carry_in")))
      .select(col(keyCol), col("bucket"), col("n"), col("observed"),
        col("filled_cents"))
  }
}
