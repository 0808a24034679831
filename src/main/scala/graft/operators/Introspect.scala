package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Schema introspection (SURVEY §2 O4): the notebook derives its
  * numeric-vs-categorical feature lists from dtypes
  * (`select_dtypes("int64","int32")` / `select_dtypes("bool")`,
  * cell 9 json:130-132). Same capability over StructType.
  */
object Introspect {

  def columnsOfType(df: DataFrame, types: DataType*): Seq[String] = {
    val wanted = types.toSet
    df.schema.fields.filter(f => wanted.contains(f.dataType)).map(_.name).toSeq
  }

  /** The notebook's "numeric" bucket (int32/int64 → Spark int/long). */
  def intCols(df: DataFrame): Seq[String] =
    columnsOfType(df, IntegerType, LongType)

  def boolCols(df: DataFrame): Seq[String] = columnsOfType(df, BooleanType)

  def numericCols(df: DataFrame): Seq[String] =
    columnsOfType(df, IntegerType, LongType, FloatType, DoubleType,
      ShortType, ByteType)

  /** Column profile — the data-quality report every ingest runs
    * first: per column, non-null count, exact distinct count, and
    * min/max (as strings, so one output schema covers heterogeneous
    * column types). ONE aggregation pass over the table (Catalyst
    * plans the multi-distinct via Expand — |cols| replicas of the
    * fact through one shuffle); the melt to one-row-per-column
    * happens on the single aggregated row. At 100 TB with many
    * profiled columns, swap exact distincts for the HLL sketch
    * (operators/Sketch) — same report shape, one fact pass total.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    val aggs = cols.flatMap(c => Seq(
      count(col(c)).as(s"${c}__nn"),
      count_distinct(col(c)).as(s"${c}__nd"),
      min(col(c)).cast("string").as(s"${c}__mn"),
      max(col(c)).cast("string").as(s"${c}__mx")))
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val stackExpr =
      s"stack(${cols.size}, " + cols.map(c =>
        s"'$c', `${c}__nn`, `${c}__nd`, `${c}__mn`, `${c}__mx`")
        .mkString(", ") +
        ") AS (column, n_nonnull, n_distinct, min_str, max_str)"
    one.select(col("__n").as("n_rows"), expr(stackExpr))
      .select("column", "n_rows", "n_nonnull", "n_distinct",
        "min_str", "max_str")
  }
}
