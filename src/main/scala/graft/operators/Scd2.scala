package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 (Kimball) over a change log —
  * the lakehouse-standard way to keep full attribute history for a
  * dimension fed by an event stream: one row per (key, value
  * version) with a half-open validity interval
  * `[valid_from, valid_to)`, the live version flagged `is_current`
  * with a NULL `valid_to`.
  *
  * Two entry points: [[fromChangeLog]] (full rebuild — the batch
  * backfill) and [[merge]] (incremental — fold one arrival batch
  * into an existing dimension touching ONLY the keys present in
  * the batch). The q_x_scd2_merge oracle proves the merge contract
  * cross-engine: Spark runs the incremental path, DuckDB replays
  * the full rebuild over the union, and the hashes must agree.
  *
  * Determinism: change ordering is `(tsCol, tieCol)` — the tie
  * column (an event id) makes same-timestamp changes replayable on
  * any engine. Consecutive same-value rows collapse (no spurious
  * versions), the SCD2-correct reading of an at-least-once feed.
  *
  * Contract for [[merge]]: every batch row must be strictly later
  * than the open version's `valid_from` for its key (no late data
  * across the merge boundary — closed history is immutable). Late
  * rows would interleave into closed intervals only a full rebuild
  * can produce; feed them to [[fromChangeLog]] instead.
  *
  * Scale shape: [[fromChangeLog]] is one shuffle by key + one sort
  * providing both window passes. [[merge]] never rewrites history:
  * untouched keys and closed versions pass through scan-to-sink;
  * only (batch keys × open row + batch rows) — batch-sized, not
  * dimension-sized — re-enter the window.
  */
object Scd2 {

  /** Build the SCD2 dimension from a change log. Output columns:
    * keyCol, tieCol, valCol, `valid_from`, `valid_to` (NULL = open),
    * `is_current`. The tie column is kept as version provenance —
    * and [[merge]] needs it to re-order the open version against
    * the batch.
    */
  def fromChangeLog(log: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, valCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    val changes = log
      .select(col(keyCol), col(tsCol), col(tieCol), col(valCol))
      .withColumn("_prev", lag(col(valCol), 1).over(w))
      .filter(col("_prev").isNull || !(col("_prev") <=> col(valCol)))
      .drop("_prev")
    changes
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumnRenamed(tsCol, "valid_from")
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Fold an arrival batch (same shape as the change log) into an
    * existing dimension built by [[fromChangeLog]]. Keys absent
    * from the batch pass through untouched; for touched keys the
    * closed history passes through and only the open version is
    * re-derived against the batch (collapsing with it when the
    * batch's first change carries the same value — no spurious
    * version). New keys appear with their full batch timeline.
    */
  def merge(dim: DataFrame, batch: DataFrame, keyCol: String,
      tsCol: String, tieCol: String, valCol: String): DataFrame = {
    val keys = batch.select(col(keyCol)).distinct()
    val untouched = dim.join(keys, Seq(keyCol), "left_anti")
    val touched = dim.join(keys, Seq(keyCol), "left_semi")
    val closed = touched.filter(!col("is_current"))
    val openAsLog = touched.filter(col("is_current"))
      .select(col(keyCol), col("valid_from").as(tsCol), col(tieCol),
        col(valCol))
    val rebuilt = fromChangeLog(
      openAsLog.unionByName(
        batch.select(col(keyCol), col(tsCol), col(tieCol), col(valCol))),
      keyCol, tsCol, tieCol, valCol)
    untouched.unionByName(closed).unionByName(rebuilt)
  }

  /** Point-in-time lookup: the version of each key valid at `at`
    * (half-open intervals: `valid_from <= at < valid_to`).
    */
  def asOf(dim: DataFrame, at: Column): DataFrame =
    dim.filter(col("valid_from") <= at &&
      (col("valid_to").isNull || at < col("valid_to")))

  /** Retention GC plan: per key, how many closed versions expired
    * before the time-travel `watermark` (their validity ENDED before
    * it, so no as-of query at or after the watermark can ever read
    * them — the standard lakehouse vacuum rule) vs. versions that
    * must stay, plus the earliest surviving `valid_from`. The planner
    * is metadata-scale: one aggregation over the dimension, output
    * one row per key for the partition-delete pass to consume.
    */
  def retentionPlan(dim: DataFrame, keyCol: String,
      watermark: Column): DataFrame = {
    val expired = col("valid_to").isNotNull && col("valid_to") < watermark
    dim.groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n_versions"),
        coalesce(sum(when(expired, 1L)), lit(0L)).as("n_expired"),
        min(when(!expired, col("valid_from"))).as("keep_from"))
  }
}
