package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Row-level diff of two snapshots of the same table — the
  * regression-diff a pipeline runs between yesterday's output and
  * today's before publishing: which keys were added, removed, or
  * changed. (Table formats version FILES; answering "what rows
  * changed" still takes this join.)
  *
  * Changed-ness is a null-safe column-by-column comparison (`<=>`),
  * not a digest: exact, codegen'd, and trivially replayable in the
  * oracle (`IS DISTINCT FROM`) — a hash digest would need a
  * cross-engine hash for no benefit here.
  *
  * Scale shape: ONE full-outer shuffle join on the key — the
  * unavoidable minimum for an exact diff of unsorted snapshots; both
  * sides shed their unchanged-width early (only compared columns are
  * read — column pruning reaches the scans). When both snapshots are
  * written bucketed by the key (sinks/Bucketed), the same plan runs
  * with ZERO exchanges, which is how a daily 100 TB diff should be
  * deployed.
  */
object SnapshotDiff {

  /** (keys..., status ∈ added|removed|changed) — unchanged rows are
    * dropped. Both inputs must share the key + compared columns.
    */
  def diff(old: DataFrame, nu: DataFrame, keys: Seq[String],
      compare: Seq[String]): DataFrame = {
    val o = old.select(
      keys.map(col) ++ compare.map(c => col(c).as(s"__o_$c"))
        :+ lit(1).as("__o_present"): _*)
    val n = nu.select(
      keys.map(col) ++ compare.map(c => col(c).as(s"__n_$c"))
        :+ lit(1).as("__n_present"): _*)
    val changed = compare
      .map(c => !(col(s"__o_$c") <=> col(s"__n_$c")))
      .reduce(_ || _)
    o.join(n, keys, "full_outer")
      .withColumn("status",
        when(col("__o_present").isNull, lit("added"))
          .when(col("__n_present").isNull, lit("removed"))
          .when(changed, lit("changed")))
      .filter(col("status").isNotNull)
      .select(keys.map(col) :+ col("status"): _*)
  }
}
