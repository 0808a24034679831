package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data layout — multi-dimensional clustering for
  * file skipping. Sorting a 100 TB table by ONE column makes its
  * min/max file statistics razor-sharp for that column and useless
  * for every other; interleaving the bits of two columns gives every
  * file a narrow min/max window in BOTH dimensions, so predicates on
  * either column (or both) prune files at planning time. This is the
  * standard lakehouse layout trick (Delta/Iceberg `ZORDER BY`),
  * rebuilt here as a plain column expression + range-partitioned
  * write — no table format required.
  *
  * The z-value is exact integer arithmetic (shifts, masks, adds) in
  * both engines — the oracle replays the identical unrolled sum.
  */
object ZOrder {

  /** Morton key of two non-negative integer columns: bit i of x lands
    * at position 2i, bit i of y at 2i+1. `bits` per dimension (16 ⇒
    * a 32-bit key; values must fit in `bits` bits — callers with
    * wider domains rank-compress first).
    */
  def zValue2(x: Column, y: Column, bits: Int = 16): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .plus(shiftright(x.cast("long"), i).bitwiseAND(lit(1L))
          * lit(1L << (2 * i)))
        .plus(shiftright(y.cast("long"), i).bitwiseAND(lit(1L))
          * lit(1L << (2 * i + 1)))
    }

  /** SQL rendering of [[zValue2]] — the same unrolled exact-integer
    * sum, term for term.
    */
  def zValue2Sql(x: String, y: String, bits: Int = 16): String =
    (0 until bits).map { i =>
      s"((($x >> $i) & 1) * ${1L << (2 * i)}" +
        s" + (($y >> $i) & 1) * ${1L << (2 * i + 1)})"
    }.mkString(" + ")

  /** Write `df` z-clustered on (x, y): both dimensions min-max scale
    * to the FULL `bits` width first — interleaving raw values whose
    * ranges differ (say an 11-bit key with a 7-bit one) degenerates
    * to wide-key-major order at file granularity, because above the
    * narrow key's top bit every interleaved bit belongs to the wide
    * key. Scaling makes the curve alternate dimensions at every
    * level, so each of the `nFiles` z-chunks is a compact rectangle
    * in (x, y) and BOTH columns' file-level min/max statistics stay
    * narrow. The range bounds ride in as one broadcast grand agg (no
    * driver action); then one range-exchange (sampled boundaries),
    * no global sort.
    */
  def writeClustered(df: DataFrame, xCol: String, yCol: String,
      path: String, nFiles: Int, bits: Int = 16): Unit = {
    val r = df.agg(
      min(col(xCol).cast("long")).as("__lx"),
      max(col(xCol).cast("long")).as("__hx"),
      min(col(yCol).cast("long")).as("__ly"),
      max(col(yCol).cast("long")).as("__hy"))
    def scaled(c: Column, lo: Column, hi: Column): Column =
      floor(((c.cast("long") - lo) * lit(1L << bits))
        / (hi - lo + lit(1L))).cast("long")
    df.crossJoin(broadcast(r))
      .withColumn("__z", zValue2(
        scaled(col(xCol), col("__lx"), col("__hx")),
        scaled(col(yCol), col("__ly"), col("__hy")), bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z", "__lx", "__hx", "__ly", "__hy")
      .write.mode("overwrite").parquet(path)
  }
}
