package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Small-file compaction planning — the lakehouse OPTIMIZE decision:
  * given a file listing (partition, file, bytes), group files into
  * target-sized output bins so a rewrite job can compact each bin in
  * one task. The planner is the cheap part that must never become the
  * bottleneck: all work here runs on file METADATA (a 100 TB table is
  * ~10⁵–10⁶ manifest rows, not data rows), one window pass per
  * partition — the expensive rewrite it drives then reads each input
  * file exactly once.
  *
  * Bin rule: within a partition, order files by (bytes DESC, id) —
  * biggest-first, the first-fit-decreasing order — and assign
  * bin = ⌊running-bytes-before-this-file / targetBytes⌋. The prefix-sum
  * rule is deliberate: a greedy fill-then-reset walk is sequential
  * state no SQL replay could follow (the sentence-chunking / CDC
  * lesson), while the prefix quotient is deterministic, replayable,
  * and overshoots each bin by at most one file. A file larger than
  * the target lands alone in its own bin(s range) — it simply
  * advances the prefix past a bin boundary.
  */
object Compaction {

  /** Per-file bin assignment: (part, file_id, bytes, bin). */
  def binPack(
      files: DataFrame,
      partCol: String,
      idCol: String,
      bytesCol: String,
      targetBytes: Long): DataFrame = {
    val w = Window.partitionBy(partCol)
      .orderBy(col(bytesCol).desc, col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    // `div` (truncating LONG division), never `/`+cast: the double
    // round-trip is exact only while the prefix sum stays under 2^53
    // bytes — past that the IEEE rounding could drift the bin off the
    // oracle's integer `//`. Long arithmetic is exact at any scale.
    files.select(col(partCol), col(idCol), col(bytesCol))
      .withColumn("prefix_b",
        coalesce(sum(col(bytesCol)).over(w), lit(0L)))
      .withColumn("bin", expr(s"prefix_b div ${targetBytes}L"))
      .drop("prefix_b")
  }

  /** Compaction summary per output bin: how many input files merge,
    * total bytes, and whether the bin is under-filled (the tail bin of
    * each partition usually is — the signal for cross-partition
    * consolidation policies). `small` counts inputs under half the
    * target: the small-file count the compaction exists to drive down.
    */
  def plan(
      files: DataFrame,
      partCol: String,
      idCol: String,
      bytesCol: String,
      targetBytes: Long): DataFrame =
    binPack(files, partCol, idCol, bytesCol, targetBytes)
      .groupBy(col(partCol), col("bin"))
      .agg(count(lit(1)).as("n_files"),
        sum(col(bytesCol)).as("bytes_total"),
        sum(when(col(bytesCol) < targetBytes / 2, 1L).otherwise(0L))
          .as("n_small_inputs"))
      .withColumn("under_target", col("bytes_total") < targetBytes)
}
