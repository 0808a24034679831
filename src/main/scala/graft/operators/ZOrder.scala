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

  /** Hilbert d-value of two non-negative integer columns on the
    * 2^bits grid — the locality-tighter layout key beside [[zValue2]]
    * (continuous curve: consecutive indices are ADJACENT cells, so
    * range-chunks are better rectangles than Z's diagonal-jump
    * quadrants; Delta shipped this exact upgrade as liquid
    * clustering). Native O(bits) kernel
    * ([[graft.expressions.HilbertIndex]]): the reflect-rotate walk is
    * sequential across levels, so a column-fold rendering would grow
    * 4^bits or cost bits× plan depth — same reason the byte kernels
    * are native. Values must fit `bits` bits (min-max scale first).
    */
  def hilbertValue2(x: Column, y: Column, bits: Int = 16): Column =
    graft.expressions.HilbertIndex(x.cast("long"), y.cast("long"), bits)

  /** SQL rendering of [[hilbertValue2]] as `bits` chained CTE
    * rewrites of (hx, hy, hd) — the identical reflect-rotate walk,
    * level for level. Returns the body of a WITH clause; the final
    * CTE is `h<bits>` carrying `passCols` plus `hd`.
    */
  def hilbertValue2SqlCtes(
      table: String, passCols: String, x: String, y: String,
      bits: Int): String = {
    val levels = ((bits - 1) to 0 by -1).zipWithIndex.map { case (b, k) =>
      val s = 1L << b
      s"""h${k + 1} AS (SELECT $passCols,
         |  CASE WHEN ry = 0 THEN CASE WHEN rx = 1 THEN ${s - 1} - hy ELSE hy END ELSE hx END AS hx,
         |  CASE WHEN ry = 0 THEN CASE WHEN rx = 1 THEN ${s - 1} - hx ELSE hx END ELSE hy END AS hy,
         |  hd + ${s * s} * CASE WHEN rx = 1 THEN CASE WHEN ry = 1 THEN 2 ELSE 3 END ELSE ry END AS hd
         |FROM (SELECT *, CASE WHEN (hx & $s) > 0 THEN 1 ELSE 0 END AS rx,
         |        CASE WHEN (hy & $s) > 0 THEN 1 ELSE 0 END AS ry
         |      FROM h$k))""".stripMargin
    }
    s"""h0 AS (SELECT $passCols, CAST($x AS BIGINT) AS hx,
       |  CAST($y AS BIGINT) AS hy, CAST(0 AS BIGINT) AS hd FROM $table),
       |${levels.mkString(",\n")}""".stripMargin
  }

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
