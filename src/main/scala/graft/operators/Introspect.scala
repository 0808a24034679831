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
    * profiled columns, use [[profileSketch]] — same report shape with
    * the exact distincts swapped for the HLL sketch.
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

  /** The 100 TB rendering of [[profile]]: identical report shape with
    * `n_distinct` replaced by the deterministic HLL estimate
    * (operators/Sketch — integer registers, so the *estimate itself*
    * is oracle-exact). Why it scales where the exact profile can't:
    * `profile`'s multi-distinct plans via Expand, shuffling |cols|
    * replicas of every fact row; here pass 1 is a plain grand agg
    * (count/min/max — map-side combining, no Expand) and pass 2 melts
    * each row to (column, surrogate-key) pairs whose HLL register agg
    * combines map-side down to |cols|·256 rows — the shuffle is
    * sketch-sized no matter how wide or tall the table. String
    * columns ride the rolling-hash fingerprint (TextFingerprint, the
    * same fold the DuckDB oracle replays); integral/boolean columns
    * hash directly (lossless long widening). Fractional, decimal, and
    * date/time columns fingerprint their CANONICAL STRING rendering —
    * Spark's cast-to-string is injective per type (distinct values
    * render distinctly), so distinct counting is sound; note the
    * register values for those types then depend on the engine's
    * rendering, so cross-engine oracle exactness holds for
    * integral/string columns (the q_o14b contract) while other types
    * get an engine-consistent estimate. Unsupported types (array,
    * map, struct, binary) throw rather than silently collapse.
    * NULLs are excluded from distincts exactly as COUNT(DISTINCT)
    * excludes them.
    */
  def profileSketch(df: DataFrame, cols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    val aggs = cols.flatMap(c => Seq(
      count(col(c)).as(s"${c}__nn"),
      min(col(c)).cast("string").as(s"${c}__mn"),
      max(col(c)).cast("string").as(s"${c}__mx")))
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val stackExpr =
      s"stack(${cols.size}, " + cols.map(c =>
        s"'$c', `${c}__nn`, `${c}__mn`, `${c}__mx`").mkString(", ") +
        ") AS (column, n_nonnull, min_str, max_str)"
    val basic = one.select(col("__n").as("n_rows"), expr(stackExpr))

    def surrogate(c: String): org.apache.spark.sql.Column =
      df.schema(c).dataType match {
        case StringType => graft.expressions.TextFingerprint(col(c))
        case ByteType | ShortType | IntegerType | LongType | BooleanType =>
          col(c).cast("long")
        case FloatType | DoubleType | _: DecimalType | DateType |
            TimestampType | TimestampNTZType =>
          graft.expressions.TextFingerprint(col(c).cast("string"))
        case dt => throw new IllegalArgumentException(
          s"profileSketch: unsupported column type $dt for `$c` — " +
            "supported: string, integral, boolean, fractional, decimal, " +
            "date/timestamp")
      }
    val melted = df
      .select(explode(array(cols.map(c =>
        struct(lit(c).as("column"), surrogate(c).as("k"))): _*)).as("kv"))
      .select(col("kv.column").as("column"), col("kv.k").as("k"))
      .filter(col("k").isNotNull)
    val est = Sketch.hllEstimate(melted, Seq("column"), "k")
      .withColumnRenamed("hll_est", "n_distinct_est")
    basic.join(est, Seq("column"), "left")
      .select(col("column"), col("n_rows"), col("n_nonnull"),
        coalesce(col("n_distinct_est"), lit(0L)).as("n_distinct_est"),
        col("min_str"), col("max_str"))
  }
}
