package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Deterministic positional (temporal) split WITHOUT a global window.
  *
  * The parity-exact rendering of "first n rows in (k1, k2) order"
  * (reference notebook iloc split, Traffic-Prediction-Modelling.ipynb
  * cell 13) is `row_number() OVER (ORDER BY k1, k2) <= n` — which
  * single-partitions the whole table. At 100 TB that window IS the
  * job. This operator computes the identical result with nothing
  * global:
  *
  *   1. per-k1 counts: one map-side-combining agg, |distinct k1| rows
  *      (dates/hours — bounded at any fact scale, like an IVF
  *      codebook: a legitimate driver-side scalar);
  *   2. driver prefix-scan finds the boundary k1 value D and the
  *      residual rank r inside it;
  *   3. the r-th smallest k2 within D via orderBy+limit — Spark's
  *      TakeOrdered, a per-partition heap, never a full sort;
  *   4. the split is then a pure FILTER `(k1 < D) or (k1 = D and
  *      k2 <= K)` — pushdown-friendly, partition-prunable if the
  *      table is partitioned by k1;
  *   5. global positions (when wanted) come from a per-k1 PARTITIONED
  *      window plus the broadcast per-k1 offsets — no single-partition
  *      stage anywhere.
  *
  * Requires (k1, k2) non-null and unique per row (the same assumption
  * the row_number rendering makes for determinism).
  */
object PositionalSplit {

  /** Cardinality contract for the driver-side prefix scan: the
    * per-k1 count collect is sound only while |distinct k1| stays
    * driver-sized (dates/hours — thousands). A timestamp-grained
    * boundary key breaks that silently, so past this bound the
    * operators FALL BACK to the parity-exact global-window rendering
    * (correct at any cardinality; single-partition sort — the cost
    * the coarse-key path exists to avoid, and the right trade when
    * the key turns out fine-grained). The probe is a TakeOrdered of
    * `maxBoundaryKeys + 1` rows, so the driver never collects an
    * unbounded count table either way.
    */
  val DefaultMaxBoundaryKeys = 100000

  /** Per-k1 cumulative offsets + the (D, K) boundary for rank n.
    * Returns None when |distinct k1| exceeds `maxKeys` (caller falls
    * back to the global window); otherwise (offsets rows
    * (k1, cum-before), boundary (D, K) or None when the table has
    * ≤ n rows).
    */
  private def boundary(
      df: DataFrame, k1: String, k2: String, n: Long,
      maxKeys: Int): Option[(Seq[(Any, Long)], Option[(Any, Any)])] = {
    val counts = df.groupBy(k1).agg(count(lit(1)).as("__c"))
      .orderBy(k1).limit(maxKeys + 1).collect() // heap-bounded collect
    if (counts.length > maxKeys) return None
    var cum = 0L
    val offsets = Seq.newBuilder[(Any, Long)]
    var bound: Option[(Any, Long)] = None
    counts.foreach { row =>
      if (bound.isEmpty) {
        offsets += ((row.get(0), cum))
        val c = row.getLong(1)
        if (cum + c >= n) bound = Some((row.get(0), n - cum))
        cum += c
      }
    }
    bound match {
      case None => Some((offsets.result(), None)) // whole table fits in n
      case Some((d, r)) =>
        // r-th smallest k2 inside D: TakeOrdered (heap), then max
        val k = df.filter(col(k1) === lit(d))
          .select(col(k2)).orderBy(col(k2)).limit(r.toInt)
          .agg(max(col(k2))).first().get(0)
        Some((offsets.result(), Some((d, k))))
    }
  }

  private def keepPred(k1: String, k2: String, b: Option[(Any, Any)]) =
    b match {
      case Some((d, k)) =>
        col(k1) < lit(d) || (col(k1) === lit(d) && col(k2) <= lit(k))
      case None => lit(true)
    }

  /** The first n rows in (k1, k2) order, with their 1-based global
    * position `rn` — value-identical to the global-row_number
    * rendering, built from the boundary filter + partitioned window.
    * Falls back to the global window itself past `maxBoundaryKeys`
    * distinct k1 values (see [[DefaultMaxBoundaryKeys]]).
    */
  def firstNWithRank(
      df: DataFrame, k1: String, k2: String, n: Long,
      maxBoundaryKeys: Int = DefaultMaxBoundaryKeys): DataFrame =
    // n <= 0 short-circuit (fuzz r13, positional_split s6/s12): the
    // boundary path computes the residual rank r = 0 there, so the
    // "r-th smallest k2" probe is max() over LIMIT 0 = NULL, and the
    // NULL boundary makes `k2 <= K` three-valued — first-group rows
    // vanished from BOTH splits. Only n <= 0 can reach r = 0 (for
    // n >= 1 the first qualifying group has r = n - cum >= 1).
    if (n <= 0L)
      df.withColumn("rn", lit(0L)).filter(lit(false))
    else boundary(df, k1, k2, n, maxBoundaryKeys) match {
      case Some((offsets, b)) =>
        val spark = df.sparkSession
        val schema = StructType(Seq(
          df.schema(df.schema.fieldIndex(k1)).copy(name = k1),
          StructField("__cum0", LongType, nullable = false)))
        val offsetsDf = spark.createDataFrame(
          spark.sparkContext.parallelize(
            offsets.map { case (v, c) => Row(v, c) }, 1),
          schema)
        val wp = Window.partitionBy(k1).orderBy(k2)
        df.filter(keepPred(k1, k2, b))
          .join(broadcast(offsetsDf), Seq(k1))
          .withColumn("rn",
            row_number().over(wp).cast("long") + col("__cum0"))
          .drop("__cum0")
      case None => // fine-grained boundary key: parity-exact fallback
        df.withColumn("rn",
            row_number().over(Window.orderBy(col(k1), col(k2))).cast("long"))
          .filter(col("rn") <= n)
    }

  /** (first n rows, remainder) in (k1, k2) order — the train/test
    * temporal split as two complementary filters over one boundary.
    * Same fine-grained-key fallback as [[firstNWithRank]].
    */
  def splitAt(
      df: DataFrame, k1: String, k2: String, n: Long,
      maxBoundaryKeys: Int = DefaultMaxBoundaryKeys): (DataFrame, DataFrame) =
    // n <= 0: empty train, everything test (see firstNWithRank note)
    if (n <= 0L) (df.filter(lit(false)), df)
    else boundary(df, k1, k2, n, maxBoundaryKeys) match {
      case Some((_, b)) =>
        val keep = keepPred(k1, k2, b)
        (df.filter(keep), df.filter(!keep))
      case None =>
        val ranked = df.withColumn("__rn",
          row_number().over(Window.orderBy(col(k1), col(k2))).cast("long"))
        (ranked.filter(col("__rn") <= n).drop("__rn"),
          ranked.filter(col("__rn") > n).drop("__rn"))
    }
}
