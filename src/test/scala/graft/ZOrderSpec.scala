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

  test("hilbertValue2: bijective on the full 32x32 grid, CONTINUOUS " +
      "(consecutive indices are adjacent cells — the property Z " +
      "lacks), and range-chunks beat Z-order's worst-dim span") {
    val n = 32
    val grid = (for { x <- 0 until n; y <- 0 until n } yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val d = grid.select(col("x"), col("y"),
        ZOrder.hilbertValue2(col("x"), col("y"), bits = 5).as("d"))
      .collect().map(r => (r.getLong(2), (r.getLong(0), r.getLong(1))))
      .sortBy(_._1)
    // bijection onto [0, n²)
    assert(d.map(_._1).toSeq == (0L until (n.toLong * n)).toSeq)
    // continuity: every consecutive pair of d-values is L1-adjacent
    d.sliding(2).foreach { case Array((_, (x1, y1)), (_, (x2, y2))) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"jump between ($x1,$y1) and ($x2,$y2)")
    }
    // Z-order takes long diagonal jumps (e.g. d=1→2 jumps (1,0)→(0,1));
    // measure: equal-size range-chunks of the curve, worst-dim span per
    // chunk — Hilbert's rectangles are tighter than Z's. At power-of-4-
    // aligned chunk counts BOTH curves give perfect squares, so use a
    // NON-aligned count (10): real file counts aren't curve-aligned.
    val nChunks = 10
    def chunkSpan(key: (Long, Long) => Long): Double = {
      val cells = (for { x <- 0L until n; y <- 0L until n }
        yield (key(x, y), x, y)).sortBy(_._1)
      val chunks = cells.grouped(
        math.ceil(n * n / nChunks.toDouble).toInt).toSeq
      chunks.map { c =>
        math.max(c.map(_._2).max - c.map(_._2).min,
          c.map(_._3).max - c.map(_._3).min).toDouble / (n - 1)
      }.sum / chunks.size
    }
    val hSpan = chunkSpan((x, y) => HilbertRef.xy2d(x, y, 5))
    val zSpan = chunkSpan((x, y) =>
      (0 until 5).map(i => (((x >> i) & 1) << (2 * i))
        | (((y >> i) & 1) << (2 * i + 1))).sum)
    info(f"$nChunks-chunk worst-dim span: hilbert=$hSpan%.3f z=$zSpan%.3f")
    assert(hSpan < zSpan, f"hilbert $hSpan%.3f not tighter than z $zSpan%.3f")
  }

  /** Driver-side reference of the reflect-rotate walk (same algorithm,
    * independent code path from the Catalyst expression's kernel).
    */
  private object HilbertRef {
    def xy2d(xIn: Long, yIn: Long, bits: Int): Long = {
      var x = xIn; var y = yIn; var dd = 0L
      var s = 1L << (bits - 1)
      while (s > 0) {
        val rx = if ((x & s) > 0) 1L else 0L
        val ry = if ((y & s) > 0) 1L else 0L
        dd += s * s * ((3L * rx) ^ ry)
        if (ry == 0) {
          if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
          val t = x; x = y; y = t
        }
        s >>= 1
      }
      dd
    }
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

  test("Compaction.binPack: biggest-first prefix-sum bins, oversized " +
      "file advances past bin boundaries, partitions independent") {
    import graft.operators.Compaction
    import spark.implicits._
    val files = Seq(
      ("p", 1L, 70L), ("p", 2L, 60L), ("p", 3L, 50L),
      ("p", 4L, 30L), ("p", 5L, 20L), ("p", 6L, 10L),
      ("q", 1L, 250L), ("q", 2L, 40L))
      .toDF("part", "file_id", "bytes")
    val bins = Compaction.binPack(files, "part", "file_id", "bytes", 100L)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3))
      .toMap
    // p, desc order 70,60,50,30,20,10; prefix 0,70,130,180,210,230
    assert(bins(("p", 1L)) === 0L && bins(("p", 2L)) === 0L)
    assert(bins(("p", 3L)) === 1L && bins(("p", 4L)) === 1L)
    assert(bins(("p", 5L)) === 2L && bins(("p", 6L)) === 2L)
    // q: the 250-byte file sits alone in bin 0; the next file's prefix
    // (250) skips bin 1 entirely — oversized inputs never co-pack
    assert(bins(("q", 1L)) === 0L && bins(("q", 2L)) === 2L)

    val plan = Compaction.plan(files, "part", "file_id", "bytes", 100L)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))))
      .toMap
    assert(plan(("p", 0L)) === ((2L, 130L, 0L, false)))
    assert(plan(("p", 1L)) === ((2L, 80L, 1L, true)))
    assert(plan(("p", 2L)) === ((2L, 30L, 2L, true)))
    assert(plan(("q", 0L)) === ((1L, 250L, 0L, false)))
  }
}
