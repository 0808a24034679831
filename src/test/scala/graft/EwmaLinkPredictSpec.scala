package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.operators.{LinkPrediction, Stats}
import graft.streaming.StreamEwma

/** Round-10 batch C: truncated EWMA (+ streaming sibling) and
  * common-neighbor / resource-allocation link prediction.
  */
class EwmaLinkPredictSpec extends SparkSpec {
  import spark.implicits._

  test("groupedEwma: a constant series smooths to exactly itself " +
      "(weights sum to the denominator)") {
    val df = (0L until 12L).map(b => ("c", b, 700L)).toDF("g0", "b0", "v0")
    val out = Stats.groupedEwma(df, "g0", col("b0"), col("v0"),
      window = 6, num = 3, den = 4).collect()
    assert(out.length == 7) // 12 buckets, 5 warm-up
    out.foreach(r => assert(r.getLong(3) == 700L * 1000000L))
  }

  test("groupedEwma: a unit impulse decays by exactly c_j = 3^j*4^(5-j) " +
      "/ 3367 of the peak at age j") {
    val rows = ("s", 0L, 3367L) +: (1L until 10L).map(b => ("s", b, 0L))
    val df = rows.toDF("g0", "b0", "v0")
    val out = Stats.groupedEwma(df, "g0", col("b0"), col("v0"),
        window = 6, num = 3, den = 4)
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    // impulse X=3367 (the weight denominator), so ewma(age j) is the
    // exact integer c_j * 1e6 / 3367 * 3367/3367 = c_j*X*1e6 div 3367
    val w = (0 until 6).map(j => math.pow(3, j).toLong
      * math.pow(4, 5 - j).toLong)
    assert(w.sum == 3367L)
    (5L to 9L).foreach { b =>
      val age = (b - 0L).toInt
      val expect = if (age <= 5) w(age) * 1000000L else 0L
      assert(out(b) == expect, s"bucket $b: ${out(b)} vs $expect")
    }
  }

  test("groupedEwma zero-fills absent buckets: sparse input equals " +
      "explicitly zero-padded input") {
    val sparse = Seq(("s", 0L, 7L), ("s", 3L, 9L), ("s", 6L, 4L))
      .toDF("g0", "b0", "v0")
    val padded = Seq(("s", 0L, 7L), ("s", 1L, 0L), ("s", 2L, 0L),
      ("s", 3L, 9L), ("s", 4L, 0L), ("s", 5L, 0L), ("s", 6L, 4L))
      .toDF("g0", "b0", "v0")
    val a = Stats.groupedEwma(sparse, "g0", col("b0"), col("v0"), 3, 1, 2)
    val b = Stats.groupedEwma(padded, "g0", col("b0"), col("v0"), 3, 1, 2)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    assert(a.count() == 5) // 7 spine buckets, 2 warm-up
  }

  test("streamed bucket sums + shared finish == batch groupedEwma, " +
      "bit for bit; state is one row per (group, bucket)") {
    val ev = Tables.events(spark, Sf0001)
      .select(col("event_type").as("g0"),
        expr("unix_timestamp(ts) div 3600").as("b0"),
        floor(col("value") * 100).cast("long").as("v0"))
    val dir = tmpDir("stream_ewma")
    ev.write.mode("overwrite").parquet(dir + "/in")

    val sink = s"ewma_state_${System.nanoTime()}"
    val q = StreamEwma.bucketSums(
        spark.readStream.schema(ev.schema).parquet(dir + "/in"),
        "g0", col("b0"), col("v0"))
      .writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", dir + "/ckpt")
      .start()
    q.awaitTermination(120000)

    val state = spark.table(sink)
    val nKeys = ev.select(col("g0"), expr("b0")).distinct().count()
    assert(state.count() === nKeys) // one sum row per (group, bucket)
    val streamed = StreamEwma.ewmaFrom(state, 6, 3, 4)
      .collect().map(_.toSeq).toSet
    val batch = Stats.groupedEwma(ev, "g0", col("b0"), col("v0"), 6, 3, 4)
      .collect().map(_.toSeq).toSet
    assert(streamed === batch && streamed.nonEmpty)

    // the SAME drained state finishes to the bit-exact batch ACF —
    // StreamAcf and StreamEwma share one state store by construction
    val acfStreamed = graft.streaming.StreamAcf.acfFrom(state, 4)
      .collect().map(_.toSeq).toSet
    val acfBatch = Stats.groupedAcf(ev, "g0", col("b0"), col("v0"), 4)
      .collect().map(_.toSeq).toSet
    assert(acfStreamed === acfBatch && acfStreamed.nonEmpty)
  }

  test("commonNeighborScores: path a-z-b scores (cn 1, ra 1e6 div " +
      "deg z); existing edges are excluded; a hub neighbor generates " +
      "no wedges") {
    // z=10 links 1,2,3 (deg 3); hub=99 links 1..6 (deg 6, over cap 5);
    // plus direct edge 1-2 (so pair (1,2) is adjacent -> excluded)
    val edges = (Seq((10L, 1L), (10L, 2L), (10L, 3L), (1L, 2L)) ++
      (1L to 6L).map(n => (99L, n))).toDF("src", "dst")
    val out = LinkPrediction.commonNeighborScores(
        edges, "src", "dst", maxDeg = 5, minCn = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    // z=10 has deg 3 (but also edge to... 10-1,10-2,10-3 => deg 3)
    assert(out((1L, 3L)) == ((1L, 1000000L / 3)))
    assert(out((2L, 3L)) == ((1L, 1000000L / 3)))
    assert(!out.contains((1L, 2L)), "adjacent pair must be excluded")
    // pairs only via hub 99 (e.g. (4,5)) must not appear: hub cut
    assert(!out.contains((4L, 5L)) && !out.contains((5L, 6L)))
  }

  test("commonNeighborScores: two shared neighbors sum their RA " +
      "weights and cn counts both") {
    val edges = Seq((10L, 1L), (10L, 2L), (20L, 1L), (20L, 2L),
      (20L, 3L)).toDF("src", "dst")
    val out = LinkPrediction.commonNeighborScores(
        edges, "src", "dst", maxDeg = 10, minCn = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    // deg(10)=2, deg(20)=3; pair (1,2) shares both
    assert(out((1L, 2L)) == ((2L, 1000000L / 2 + 1000000L / 3)))
    assert(out((1L, 3L)) == ((1L, 1000000L / 3)))
  }

  test("operators are partitioning-invariant on real data") {
    val ev = Tables.events(spark, Sf0001)
    val b = (unix_timestamp(col("ts")) / 3600L).cast("long")
    val v = (col("value").cast("decimal(12,2)") * 100).cast("long")
    val e1 = Stats.groupedEwma(ev, "event_type", b, v, 6, 3, 4)
    val e2 = Stats.groupedEwma(ev.repartition(7), "event_type", b, v,
      6, 3, 4)
    assert(e1.exceptAll(e2).isEmpty && e2.exceptAll(e1).isEmpty)

    val li = Tables.lineitem(spark, Sf0001).filter(col("l_linenumber") === 1)
      .select((col("l_orderkey") % 4000).as("src"),
        ((col("l_orderkey") * 13 + col("l_suppkey")) % 4000).as("dst"))
    val l1 = LinkPrediction.commonNeighborScores(li, "src", "dst", 40, 1)
    val l2 = LinkPrediction.commonNeighborScores(li.repartition(7),
      "src", "dst", 40, 1)
    assert(l1.exceptAll(l2).isEmpty && l2.exceptAll(l1).isEmpty)
  }
}
