package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval-containment) join without an equi key — the join
  * shape Spark's planner renders as BroadcastNestedLoopJoin (or worse,
  * a cartesian product) if expressed directly as
  * `points.join(intervals, p >= s && p < e)`. Reference scope: the
  * reference's only temporal alignment is an exact (Date, Hour) equi
  * join; this is the training-data-pipeline extension for "events
  * within a window of X" alignment.
  *
  * Scale plan: overlap bucketing. Pick a bucket width W; a point
  * belongs to exactly one bucket `p div W`; an interval [s, e) is
  * exploded to every bucket it covers. The join becomes an EQUI join
  * on the bucket id — hash-shuffled both sides, AQE-skew-splittable,
  * never nested-loop — followed by the exact containment filter.
  * Each (interval, point) pair meets in exactly one bucket (the
  * point's), so no post-join dedup is needed. Cost: |intervals| ×
  * (len/W + 1) exploded rows; pick W near the typical interval length
  * so the blowup is ~2×. A cartesian rendering is O(|P|·|I|);
  * this is O(|P| + |I|·len/W + pairs) — the difference between
  * impossible and routine at 100 TB.
  */
object RangeJoin {

  /** Join `points` (long column `pointCol`) to `intervals` (long
    * columns `startCol`, `endCol`, half-open [start, end)) on
    * containment. Output: every (interval row ++ point row) match.
    * `bucket` is the overlap-bucket width in the same units as the
    * point column (pick ≈ the typical interval length).
    *
    * Column names must be disjoint between the two sides apart from
    * the internal `__bkt` key.
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      startCol: String,
      endCol: String,
      bucket: Long): DataFrame = {
    require(bucket > 0, "bucket width must be positive")
    val p = points.withColumn("__bkt", floorDiv(col(pointCol), bucket))
    val i = intervals.withColumn(
      "__bkt",
      explode(sequence(
        floorDiv(col(startCol), bucket),
        // end is exclusive: a bucket is covered iff it contains some
        // t with s <= t < e, so the last covered bucket is (e-1) div W
        floorDiv(col(endCol) - 1, bucket))))
    i.join(p, Seq("__bkt"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__bkt")
  }

  private def floorDiv(c: Column, w: Long): Column =
    floor(c / lit(w)).cast("long")
}
