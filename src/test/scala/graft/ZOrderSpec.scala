package graft

import org.apache.spark.sql.functions._

import graft.operators.ZOrder

/** Z-order layout: the Morton key interleaves correctly, and a
  * z-clustered write keeps per-file min/max statistics narrow in BOTH
  * dimensions — the property file skipping depends on, which a
  * single-column sort provides for one dimension only.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zValue2 matches a driver-side bit interleave") {
    val pairs = Seq((0, 0), (1, 0), (0, 1), (1, 1), (5, 9),
      (65535, 65535), (12345, 54321))
    def ref(x: Int, y: Int): Long =
      (0 until 16).map { i =>
        (((x >> i) & 1).toLong << (2 * i)) |
          (((y >> i) & 1).toLong << (2 * i + 1))
      }.sum
    val got = pairs.toDF("x", "y")
      .select(ZOrder.zValue2(col("x"), col("y"))).collect()
      .map(_.getLong(0))
    assert(got.toSeq == pairs.map { case (x, y) => ref(x, y) })
    // canonical values: z(1,0)=1, z(0,1)=2, z(1,1)=3
    assert(ref(1, 0) == 1L && ref(0, 1) == 2L && ref(1, 1) == 3L)
  }

  /** Per-file worst-dimension span fraction: for each output file,
    * the wider of the two columns' (max-min)/globalRange; averaged
    * over files. 1.0 = stats useless, small = prunable.
    */
  private def worstSpan(path: String, a: String, b: String): Double = {
    val df = spark.read.parquet(path)
      .select(input_file_name().as("f"), col(a), col(b))
    val g = df.agg(min(a).as("la"), max(a).as("ha"),
      min(b).as("lb"), max(b).as("hb")).first()
    val (la, ha, lb, hb) = (g.getLong(0), g.getLong(1),
      g.getLong(2), g.getLong(3))
    val per = df.groupBy("f").agg(
        ((max(a) - min(a)).cast("double") / (ha - la)).as("sa"),
        ((max(b) - min(b)).cast("double") / (hb - lb)).as("sb"))
      .select(greatest(col("sa"), col("sb")).as("w"))
      .agg(avg("w")).first().getDouble(0)
    per
  }

  test("z-clustered files stay narrow in BOTH dims; single-column " +
      "sort leaves the other dim unprunable") {
    val li = Tables.lineitem(spark, Sf001)
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    val zPath = tmpDir("zorder") + "/z"
    ZOrder.writeClustered(li, "l_partkey", "l_suppkey", zPath, nFiles = 16)

    val singlePath = tmpDir("zorder") + "/single"
    li.repartitionByRange(16, col("l_partkey"))
      .sortWithinPartitions("l_partkey")
      .write.mode("overwrite").parquet(singlePath)

    // identical content either way
    val back = spark.read.parquet(zPath)
    assert(back.count() == li.count())
    assert(back.exceptAll(li).isEmpty && li.exceptAll(back).isEmpty)

    val zSpan = worstSpan(zPath, "l_partkey", "l_suppkey")
    val sSpan = worstSpan(singlePath, "l_partkey", "l_suppkey")
    info(f"worst-dim span: zorder=$zSpan%.3f single-sort=$sSpan%.3f")
    // single-column sort: suppkey spans ~everything in every file;
    // z-order: both dims bounded — files are rectangles on the curve
    assert(sSpan > 0.8, s"single-sort worst span $sSpan")
    assert(zSpan < 0.6, s"zorder worst span $zSpan")
    assert(zSpan < sSpan / 2)
  }
}
