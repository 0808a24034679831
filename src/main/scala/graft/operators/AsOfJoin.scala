package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of join: for every left row, the latest right row
  * with `right.ts <= left.ts` (optionally within a tolerance), per
  * key. Spark has no ASOF JOIN operator; per the preference order the
  * semantics COMPOSE from built-ins, so no custom planner node is
  * needed: tag + union + per-key window `last(_, ignoreNulls)` ordered
  * by (ts, tag) — right rows sort before left rows at equal
  * timestamps, so ties match (DuckDB `ASOF JOIN ... ON l.ts >= r.ts`
  * semantics, which the oracle uses).
  *
  * Scale shape: ONE shuffle on the key columns + a per-key sort — the
  * same cost as the sort-merge join an engine-native as-of would do;
  * no range explosion, no per-row lookups.
  */
object AsOfJoin {

  /** @param valueCols right-side columns carried to the matched left
    *                  row (nulled when no right row precedes).
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      valueCols: Seq[String],
      toleranceSec: Option[Long] = None): DataFrame = {
    require(valueCols.nonEmpty, "valueCols must name right-side columns")
    val leftCols = left.columns.toSeq

    // the carried right-timestamp keeps the right side's actual type
    // (ns-as-long parquet reads surface BIGINT, not TIMESTAMP)
    val rtsType = right.schema(rightTs).dataType
    val taggedLeft = valueCols
      .foldLeft(left.withColumn("__tag", lit(1))
        .withColumn("__ts", col(leftTs))
        .withColumn("__rts", lit(null).cast(rtsType))) {
        (df, c) => df.withColumn(s"__v_$c", lit(null).cast(
          right.schema(c).dataType))
      }
    val taggedRight = {
      val base = right.withColumn("__tag", lit(0))
        .withColumn("__ts", col(rightTs))
        .withColumn("__rts", col(rightTs))
      val withVals = valueCols.foldLeft(base)(
        (df, c) => df.withColumn(s"__v_$c", col(c)))
      // left-only columns nulled so the union aligns
      leftCols.filterNot(keys.contains).foldLeft(withVals) { (df, c) =>
        if (df.columns.contains(c)) df.withColumn(c, lit(null).cast(
          left.schema(c).dataType))
        else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
      }
    }

    val unionCols =
      (keys ++ leftCols.filterNot(keys.contains) ++
        Seq("__tag", "__ts", "__rts") ++ valueCols.map(c => s"__v_$c"))
        .distinct
    val unioned = taggedLeft.select(unionCols.map(col): _*)
      .unionByName(taggedRight.select(unionCols.map(col): _*))

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = valueCols.foldLeft(
      unioned.withColumn("__m_ts", last(col("__rts"), ignoreNulls = true).over(w))) {
      (df, c) =>
        df.withColumn(s"__m_$c", last(col(s"__v_$c"), ignoreNulls = true).over(w))
    }

    val matched = carried.filter(col("__tag") === 1)
    val withTolerance = toleranceSec match {
      case Some(tol) =>
        require(rtsType == org.apache.spark.sql.types.TimestampType,
          s"toleranceSec requires TimestampType ts columns, got ${rtsType.sql}")
        val inTol = col("__m_ts").isNotNull &&
          (unix_timestamp(col("__ts")) - unix_timestamp(col("__m_ts")) <= tol)
        valueCols.foldLeft(
          matched.withColumn("__m_ts2",
            when(inTol, col("__m_ts")))) { (df, c) =>
          df.withColumn(s"__m_$c", when(inTol, col(s"__m_$c")))
        }.withColumn("__m_ts", col("__m_ts2")).drop("__m_ts2")
      case None => matched
    }

    val out = withTolerance
      .withColumn("matched_ts", col("__m_ts"))
    val renamed = valueCols.foldLeft(out)(
      (df, c) => df.withColumn(s"matched_$c", col(s"__m_$c")))
    renamed.select(
      (leftCols.map(col) :+ col("matched_ts")) ++
        valueCols.map(c => col(s"matched_$c")): _*)
  }
}
