package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Change-data-capture log application — the lake-maintenance primitive
  * that folds an out-of-order upsert/delete feed into latest-state:
  * one row per key carrying the payload of the key's LAST change (by a
  * total per-key sequence order), with tombstoned keys (last op =
  * delete) dropped entirely. This is the "apply the Debezium topic to
  * the table" operation, the complement of [[Scd2]] (which keeps the
  * full version history; CDC apply keeps only the head).
  *
  * Determinism: `seqCols` must totally order changes within a key
  * (e.g. a timestamp plus a unique change id as tie-break) — then the
  * result is independent of arrival order, so replays, retries, and
  * shuffled logs all converge to the same state (CdcSpec proves
  * apply(shuffle(log)) == apply(log)).
  *
  * Scale shape: ONE hash aggregation on the key — the per-key argmax
  * rides `max(struct(seq..., payload...))`, which partial-aggregates
  * map-side (each task keeps one struct per local key) so the shuffle
  * carries at most |distinct keys| rows per task, never the log. No
  * window, no sort, no join: at 100 TB the log streams through
  * scan → partial-max → one exchange → final-max. The tombstone
  * filter runs AFTER the argmax (a delete only wins if it is the
  * key's latest change — earlier deletes are superseded by later
  * upserts, the standard CDC semantics).
  */
object Cdc {

  /** Latest surviving state per key. Output: keyCol, then `seqCols`
    * and `payloadCols` of the key's last change, plus `n_changes`
    * (total log rows folded for the key, tombstones included).
    *
    * @param opCol      column holding the change kind; rows where it
    *                   equals `deleteOp` are tombstones
    */
  def applyLatest(
      log: DataFrame,
      keyCol: String,
      seqCols: Seq[String],
      opCol: String,
      payloadCols: Seq[String],
      deleteOp: String = "D"): DataFrame = {
    require(seqCols.nonEmpty, "seqCols must order changes within a key")
    val packed = struct(
      (seqCols.map(col) :+ col(opCol)) ++ payloadCols.map(col): _*)
    log
      .groupBy(col(keyCol))
      .agg(max(packed).as("_last"), count(lit(1)).as("n_changes"))
      .filter(col(s"_last.$opCol") =!= deleteOp)
      .select(
        col(keyCol) +:
          (seqCols ++ payloadCols).map(c => col(s"_last.$c").as(c)) :+
          col("n_changes"): _*)
  }
}
