package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

class SamplingSpec extends SparkSpec {

  test("hashBucketLong == hashBucket column rendering on negatives, " +
      "zero, and large keys") {
    import spark.implicits._
    import graft.operators.Sampling
    val keys = Seq(0L, 1L, -1L, 42L, -999999937L, Long.MaxValue / 2,
      1000000007L, 1000000006L)
    val fromCol = keys.toDF("k")
      .select($"k", Sampling.hashBucket($"k", 1000000).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    keys.foreach { k =>
      assert(Sampling.hashBucketLong(k, 1000000) == fromCol(k), s"key $k")
    }
  }

  test("groupCapSample: cap enforced per group, small groups intact, " +
      "picks partition-invariant and append-stable") {
    import spark.implicits._
    import graft.operators.Sampling
    val rows = (0L until 300L).map(i => (i, s"dom${i % 3}")) ++ // 100 each
      Seq((1000L, "tiny"), (1001L, "tiny"))
    val df = rows.toDF("id", "host")
    val got = Sampling.groupCapSample(df, "host", "id", cap = 7)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val byHost = got.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byHost == Map("dom0" -> 7, "dom1" -> 7, "dom2" -> 7, "tiny" -> 2))
    // partitioning invariance: same picks on a reshuffled input
    val re = Sampling.groupCapSample(df.repartition(13), "host", "id", 7)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(re == got.toSet)
    // append stability: adding rows never KICKS IN new winners beyond
    // eviction — old picks either survive or are displaced by a
    // better-priority arrival, and survivors keep their membership
    val appended = df.union(Seq((2000L, "dom0")).toDF("id", "host"))
    val after = Sampling.groupCapSample(appended, "host", "id", 7)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val dom0Before = got.filter(_._2 == "dom0").map(_._1).toSet
    val dom0After = after.filter(_._2 == "dom0").map(_._1)
    assert(dom0After.size == 7 &&
      (dom0After - 2000L).subsetOf(dom0Before))
  }
  import spark.implicits._

  test("hashSplit: weights land near target and partitioning never moves a row") {
    val docs = Tables.documents(spark, Sf001)
    val split = Sampling.hashSplit(docs, "doc_id",
      Seq("train" -> 80, "val" -> 10, "test" -> 10))
    val byName = split.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = docs.count().toDouble
    assert(byName.keySet == Set("train", "val", "test"))
    assert(math.abs(byName("train") / n - 0.8) < 0.06, byName)
    assert(math.abs(byName("val") / n - 0.1) < 0.05, byName)

    val a = split.select("doc_id", "split").collect().toSet
    val b = Sampling.hashSplit(docs.repartition(13), "doc_id",
      Seq("train" -> 80, "val" -> 10, "test" -> 10))
      .select("doc_id", "split").collect().toSet
    assert(a == b)
  }

  test("hashSplit: appending new rows never reassigns existing ones") {
    val docs = Tables.documents(spark, Sf001)
    val half = docs.filter($"doc_id" < 250)
    val w = Seq("train" -> 80, "val" -> 10, "test" -> 10)
    val before = Sampling.hashSplit(half, "doc_id", w)
      .select("doc_id", "split").collect().toSet
    val after = Sampling.hashSplit(docs, "doc_id", w)
      .filter($"doc_id" < 250).select("doc_id", "split").collect().toSet
    assert(before == after)
  }

  test("bernoulliSample: deterministic, near-fraction, pure filter") {
    val li = Tables.lineitem(spark, Sf001)
      .withColumn("__k", $"l_orderkey" * 8 + $"l_linenumber")
    val s1 = Sampling.bernoulliSample(li, "__k", 1, 10)
    val s2 = Sampling.bernoulliSample(li.repartition(7), "__k", 1, 10)
    val n = li.count().toDouble
    val k1 = s1.count()
    assert(math.abs(k1 / n - 0.1) < 0.02, s"$k1 of $n")
    assert(k1 == s2.count())
    // plan: a Filter over the scan, no Exchange
    val plan = s1.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(1500))
  }

  test("mixtureSample: per-source rates hold, unlisted sources drop") {
    val docs = Tables.documents(spark, Sf001)
    val rates = Seq(("src0", 1, 1), ("src1", 1, 2), ("src2", 1, 10))
    val kept = graft.operators.Sampling.mixtureSample(
      docs, "doc_id", "source", rates)
    val bySrc = kept.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val perSrc = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("src0") == perSrc("src0")) // 1/1 keeps everything
    assert(bySrc.keySet == Set("src0", "src1", "src2")) // whitelist
    // rate ~1/2 and ~1/10 within loose bounds on 25-doc strata
    assert(bySrc("src1") > 0 && bySrc("src1") < perSrc("src1"))
    assert(bySrc.getOrElse("src2", 0L) <= perSrc("src2") / 2)
    // partitioning-invariant
    val kept2 = graft.operators.Sampling.mixtureSample(
      docs.repartition(13), "doc_id", "source", rates)
    assert(kept2.collect().map(_.getLong(0)).toSet ==
      kept.collect().map(_.getLong(0)).toSet)
  }

  test("temperatureSample: flattens a skewed mix toward sqrt shares, " +
      "tail saturates, draw is partitioning-invariant") {
    // planted 320/80/20 skew over 420 synthetic rows
    val rows = ((0L until 320L).map(i => (i, "head")) ++
      (320L until 400L).map(i => (i, "mid")) ++
      (400L until 420L).map(i => (i, "tail"))).toDF("id", "src")
    val kept = graft.operators.Sampling.temperatureSample(
      rows, "id", "src", target = 100)
    val bySrc = kept.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // sqrt shares: 17.9/8.9/4.5 of Z=31.3 -> want ~57/29/14;
    // raw shares would be 76/19/5 — head must be flattened DOWN and
    // tail boosted UP relative to raw proportions of the 100 target
    assert(bySrc("head") < 70, bySrc.toString)
    assert(bySrc("tail") >= 10, bySrc.toString) // raw share would be ~5
    // tail rate 100*4.5/(31.3*20) = 0.71 < 1: downsampled but boosted
    assert(bySrc("tail") < 20, bySrc.toString)
    // partitioning-invariant
    val kept2 = graft.operators.Sampling.temperatureSample(
      rows.repartition(13), "id", "src", target = 100)
    assert(kept2.select("id").collect().map(_.getLong(0)).toSet ==
      kept.select("id").collect().map(_.getLong(0)).toSet)
  }

  test("epochRepeat: per-source copy counts, whitelist, and a spread " +
      "interleave; deterministic across partitionings") {
    val docs = Tables.documents(spark, Sf001)
    val out = graft.operators.Sampling.epochRepeat(
      docs, "doc_id", "source", Seq(("src0", 3), ("src1", 1)))
    val rows = out.select("doc_id", "epoch", "order_key").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val bySrc = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc == Map("src0" -> 75L, "src1" -> 25L)) // 25 docs each
    // epoch copies of one doc scatter in training order: for every
    // src0 doc the three copies' order keys must not be adjacent
    // ranks (the interleave property epoching exists for)
    val ranked = rows.sortBy(r => (r._3, r._1, r._2)).zipWithIndex
    val rankByCopy = ranked.map { case ((id, ep, _), i) => (id, ep) -> i }.toMap
    val spreads = rows.filter(_._2 > 1).map { case (id, ep, _) =>
      math.abs(rankByCopy((id, ep)) - rankByCopy((id, 1)))
    }
    assert(spreads.min > 1, s"min copy spread ${spreads.min}")
    val re = graft.operators.Sampling.epochRepeat(
      docs.repartition(13), "doc_id", "source", Seq(("src0", 3), ("src1", 1)))
      .select("doc_id", "epoch", "order_key").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(re == rows.toSet)
  }

  test("weightedSample: heavy rows dominate proportionally; draw is " +
      "deterministic and partitioning-invariant") {
    // 5000 light rows (w=1) vs 5000 heavy rows (w=10): a 500-row ES
    // sample should hold heavy rows at roughly a 10:1 ratio
    val rows = (0L until 10000L).map(i =>
      (i, if (i % 2 == 0) 10.0 else 1.0)).toDF("id", "w")
    def draw(df: org.apache.spark.sql.DataFrame) =
      Sampling.weightedSample(df, "id", col("w"), k = 500)
        .select("id").collect().map(_.getLong(0)).toSeq
    val s1 = draw(rows)
    assert(s1.length == 500 && s1.distinct.length == 500)
    val heavy = s1.count(_ % 2 == 0)
    assert(heavy > 400, s"heavy=$heavy of 500 — not weight-proportional")
    assert(heavy < 500, "light rows must still appear")
    // same rows in the same order on any partitioning, every run
    assert(draw(rows.repartition(17)) == s1)
  }

  test("gridFfill: gaps fill forward per series; leading gap stays null") {
    import graft.operators.Resample
    // series a observed at hours 0,1,3 (gap at 2); b first seen at 2
    val ev = Seq(
      ("a", 0L * 3600 + 10, 100L), ("a", 1L * 3600 + 20, 200L),
      ("a", 3L * 3600 + 30, 300L), ("a", 3L * 3600 + 40, 5L),
      ("b", 2L * 3600 + 50, 900L))
      .toDF("k", "sec", "cents")
    val got = Resample.gridFfill(ev, "k", col("sec"), col("cents"), 3600L)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getBoolean(3),
          if (r.isNullAt(4)) None else Some(r.getLong(4)))).toMap
    assert(got.size == 8) // 2 series × hours 0..3
    assert(got(("a", 2L)) == ((0L, false, Some(200L)))) // gap fills forward
    assert(got(("a", 3L)) == ((2L, true, Some(305L)))) // two obs sum
    assert(got(("b", 0L)) == ((0L, false, None))) // before first obs: null
    assert(got(("b", 1L)) == ((0L, false, None)))
    assert(got(("b", 2L)) == ((1L, true, Some(900L))))
    val re = Resample.gridFfill(ev.repartition(5), "k", col("sec"),
        col("cents"), 3600L)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getBoolean(3),
          if (r.isNullAt(4)) None else Some(r.getLong(4)))).toMap
    assert(re == got)
  }

  test("budgetWaterfill: hand-solved saturation and lambda split; " +
      "all-fit budget saturates everything; sum never exceeds budget") {
    import graft.operators.Sampling
    // ratios A 0.1 < B 1 < C 5; budget 4100:
    // A saturates (100), B saturates (1000), C gets
    // floor(3000·2000/2000) = 3000 → total exactly 4100
    val src = Seq(("A", 100L, 1000L), ("B", 1000L, 1000L),
      ("C", 10000L, 2000L)).toDF("source", "cap_tokens", "weight_milli")
    val got = Sampling.budgetWaterfill(src, budget = 4100L)
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getBoolean(3), r.getLong(4)))
    assert(got.toSeq == Seq(("A", true, 100L), ("B", true, 1000L),
      ("C", false, 3000L)), got.toSeq)
    // all-fit: every source saturates at its cap
    val fit = Sampling.budgetWaterfill(src, budget = 100000L)
      .collect().map(r => (r.getBoolean(3), r.getLong(4) == r.getLong(1)))
    assert(fit.forall(t => t._1 && t._2), fit.toSeq)
    // floor semantics: sum(alloc) <= budget on an uneven split
    val tot = Sampling.budgetWaterfill(src, budget = 4099L)
      .agg(sum("alloc_tokens")).collect().head.getLong(0)
    assert(tot <= 4099L && tot >= 4090L, tot)
    // partitioning-invariant
    val re = Sampling.budgetWaterfill(src.repartition(5), 4100L)
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getBoolean(3), r.getLong(4)))
    assert(re.toSeq == got.toSeq)
  }

  test("curriculumOrder: stages are difficulty-monotone equi-depth " +
      "cuts; within-stage order is NOT difficulty-sorted; " +
      "partitioning-invariant") {
    import graft.operators.Sampling
    val rows = (0L until 200L).map(i => (i, (i % 50) + 10))
      .toDF("id", "diff")
    val got = Sampling.curriculumOrder(rows, "id", col("diff"), nStages = 4)
      .select("id", "dv", "stage", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length == 200)
    // equi-depth up to distinct-value granularity: 4 stages of 50±1
    // value-group (each distinct difficulty holds 4 docs and can't
    // split across stages)
    val byStage = got.groupBy(_._3).view.mapValues(_.length).toMap
    assert(byStage.keySet == Set(0L, 1L, 2L, 3L), byStage)
    assert(byStage.values.forall(n => n >= 46 && n <= 54), byStage)
    // monotone: every difficulty in stage s is <= every one in s+1
    val maxByStage = got.groupBy(_._3).view.mapValues(_.map(_._2).max)
    val minByStage = got.groupBy(_._3).view.mapValues(_.map(_._2).min)
    (0L until 3L).foreach(s =>
      assert(maxByStage(s) <= minByStage(s + 1), s"stage $s overlaps"))
    // within-stage order must not be difficulty-sorted (the shuffle
    // property curriculum staging requires)
    val s0 = got.filter(_._3 == 0L).sortBy(_._4).map(_._2)
    assert(s0.zip(s0.tail).exists { case (a, b) => a > b },
      "stage 0 is difficulty-sorted — no shuffle happened")
    val re = Sampling.curriculumOrder(rows.repartition(13), "id",
        col("diff"), nStages = 4)
      .select("id", "dv", "stage", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(re.sortBy(_._1).toSeq == got.sortBy(_._1).toSeq)
  }

  test("groupKFold: one fold per group (the leakage contract), all " +
      "folds populated on real sources, append-stable") {
    import graft.operators.Sampling
    val docs = Tables.documents(spark, Sf001).select("doc_id", "source")
    val folded = Sampling.groupKFold(docs, "source", k = 5)
    // leakage contract: a group never straddles folds
    val perGroup = folded.groupBy("source")
      .agg(countDistinct("fold").as("nf"))
      .filter(col("nf") =!= 1).count()
    assert(perGroup == 0L, "a source straddles folds")
    // 20 sources over 5 folds: every fold gets at least one group
    val nFolds = folded.select("fold").distinct().count()
    assert(nFolds == 5L, s"only $nFolds folds populated")
    // append stability: re-assigning a subset gives identical folds
    val sub = Sampling.groupKFold(
        docs.filter(col("doc_id") % 3 === 0), "source", k = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val full = folded.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(sub.forall { case (id, f) => full(id) == f })
  }

  test("gridInterpolate: exact floor lerp between surrounding " +
      "observations; observed rows untouched; edges null; " +
      "partitioning-invariant") {
    import graft.operators.Resample
    // series a observed at hours 0 (cents 0) and 3 (cents 10): the
    // gap is a NON-divisible lerp — floor(10/3)=3, floor(20/3)=6.
    // series b observed at 1 (100) and 4 (negative −500): negative
    // slope exercises the pmod floor (toward −∞, not zero).
    val ev = Seq(
      ("a", 0L * 3600 + 5, 0L), ("a", 3L * 3600 + 9, 10L),
      ("b", 1L * 3600 + 1, 100L), ("b", 4L * 3600 + 2, -500L))
      .toDF("k", "sec", "cents")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getBoolean(3),
          if (r.isNullAt(4)) None else Some(r.getLong(4)))).toMap
    val got = canon(Resample.gridInterpolate(
      ev, "k", col("sec"), col("cents"), 3600L))
    assert(got.size == 10) // 2 series × hours 0..4
    assert(got(("a", 0L)) == ((true, Some(0L))))
    assert(got(("a", 1L)) == ((false, Some(3L)))) // floor(10/3)
    assert(got(("a", 2L)) == ((false, Some(6L)))) // floor(20/3)
    assert(got(("a", 3L)) == ((true, Some(10L))))
    assert(got(("a", 4L)) == ((false, None))) // after last obs
    assert(got(("b", 0L)) == ((false, None))) // before first obs
    // b: 100 → −500 over 3 steps = −200/step: exact
    assert(got(("b", 2L)) == ((false, Some(-100L))))
    assert(got(("b", 3L)) == ((false, Some(-300L))))
    val re = canon(Resample.gridInterpolate(
      ev.repartition(5), "k", col("sec"), col("cents"), 3600L))
    assert(re == got)
  }

  test("gridFfillSegmented == gridFfill, including carries across " +
      "entirely-empty ranges — the giant-single-series scale path") {
    import graft.operators.Resample
    // one giant sparse series: observations at hours 3, 7, then a
    // long silence spanning several of the 8 ranges, then 190, 199 —
    // plus a second series to keep the join honest
    val ev = (Seq(3L, 7L, 190L, 199L).map(h => ("big", h * 3600 + 1, h))
      ++ Seq(("small", 50L * 3600 + 9, 500L)))
      .toDF("k", "sec", "cents")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getBoolean(3),
          if (r.isNullAt(4)) None else Some(r.getLong(4)))).toMap
    val plain = canon(Resample.gridFfill(
      ev, "k", col("sec"), col("cents"), 3600L))
    val seg = canon(Resample.gridFfillSegmented(
      ev, "k", col("sec"), col("cents"), 3600L, nRanges = 8))
    assert(seg == plain)
    // the silent middle really crossed empty ranges: hour 100 is
    // carried from hour 7's observation
    assert(plain(("big", 100L)) == ((0L, false, Some(7L))))
    assert(seg(("big", 100L)) == ((0L, false, Some(7L))))
  }

  test("packContiguous: bins bounded by ctx + piece, docs stay in one shard") {
    import graft.operators.{Packing, TextOps}
    val chunked = Tables.documents(spark, Sf001)
      .select(col("doc_id"),
        posexplode(TextOps.chunks(col("text"), 64, 48))
          .as(Seq("chunk_idx", "chunk")))
      .select(col("doc_id"), col("chunk_idx"),
        size(TextOps.tokens(col("chunk"))).cast("long").as("n_tokens"))
    val packed = Packing.packContiguous(chunked, "doc_id",
      Seq("doc_id", "chunk_idx"), "n_tokens", ctx = 256, shards = 4)
    // all chunks of a doc share the shard
    assert(packed.groupBy("doc_id")
      .agg(countDistinct("shard").as("ns")).filter(col("ns") > 1).count() == 0)
    // pieces STARTING in a bin total at most ctx + (maxPiece - 1)
    val overs = packed.groupBy("shard", "bin")
      .agg(sum("n_tokens").as("tok")).filter(col("tok") > 256 + 63).count()
    assert(overs == 0)
    // partitioning-invariant assignment
    val packed2 = Packing.packContiguous(chunked.repartition(17), "doc_id",
      Seq("doc_id", "chunk_idx"), "n_tokens", ctx = 256, shards = 4)
    assert(packed2.collect().map(_.toSeq).toSet ==
      packed.collect().map(_.toSeq).toSet)
  }

  test("globalCumsum == global-window cumsum at every bucket size, " +
      "incl. sparse non-contiguous order keys") {
    import graft.operators.Packing
    import org.apache.spark.sql.expressions.Window
    // sparse, shuffled keys: buckets have uneven populations and gaps
    val rng = new scala.util.Random(7)
    val rows = rng.shuffle((0 until 500).map(i => (i * 13L + (i % 7), // unique
      rng.nextInt(100).toLong))).toDF("k", "v").repartition(11)
    val expect = rows
      .withColumn("cum", sum("v").over(Window.orderBy("k")))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    for (bs <- Seq(1L, 7L, 64L, 1024L, 1000000L)) {
      val got = Packing.globalCumsum(rows, "k", "v", "cum", bs)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(got == expect, s"bucketSize=$bs")
    }
  }

  test("concatCut: every sequence holds exactly seqLen tokens except " +
      "the final partial; spans abut; assignment partition-invariant") {
    import graft.operators.{Packing, TextOps}
    val docs = Tables.documents(spark, Sf001)
      .select(col("doc_id"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_toks"))
    val cut = Packing.concatCut(docs, "doc_id", "n_toks", seqLen = 128L)
    // doc spans tile the stream with no gap/overlap: end+1 == next start
    val spans = cut.select("doc_id", "start_tok", "end_tok").distinct()
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(spans.head._1 == 0L)
    spans.sliding(2).foreach {
      case Array((_, e), (s2, _)) => assert(e + 1 == s2)
      case _ =>
    }
    // per-sequence token totals: seqLen everywhere but the last
    val perSeq = cut.groupBy("seq_id").agg(sum("seq_tokens").as("t"))
      .orderBy("seq_id").collect().map(r => r.getLong(1))
    assert(perSeq.init.forall(_ == 128L))
    assert(perSeq.last <= 128L && perSeq.last > 0L)
    assert(perSeq.sum == spans.last._2 + 1) // no token lost or doubled
    // pure function of (order, counts): repartitioning changes nothing
    val re = Packing.concatCut(docs.repartition(17), "doc_id", "n_toks",
      seqLen = 128L, bucketSize = 32L)
      .select("doc_id", "seq_id", "seq_tokens")
      .collect().map(_.toSeq).toSet
    assert(re == cut.select("doc_id", "seq_id", "seq_tokens")
      .collect().map(_.toSeq).toSet)
  }

  test("hash buckets are uniform-ish across 100 buckets") {
    val counts = spark.range(100000)
      .select(Sampling.hashBucket($"id", 100).as("b"))
      .groupBy("b").count().as[(Long, Long)].collect()
    assert(counts.length == 100)
    // each bucket expects 1000; chi-square-ish slack
    assert(counts.forall { case (_, c) => c > 800 && c < 1200 }, counts.minBy(_._2))
  }

  test("lengthBucketPlan: hand fixture waste math, monotone buckets, " +
      "single-length rows never split, partition-invariant") {
    import spark.implicits._
    import graft.operators.Packing
    // 8 docs, lengths 1,1,2,2,3,3,10,10 → b=2 → bucket0 = lens {1,2}
    // (cum_below*2/8 = 0), bucket1 = {3,10}
    val docs = Seq(1L, 1L, 2L, 2L, 3L, 3L, 10L, 10L).toDF("len")
    val plan = Packing.lengthBucketPlan(docs, col("len"), 2)
      .orderBy("bucket").collect()
    assert(plan.length == 2)
    val b0 = plan(0); val b1 = plan(1)
    assert(b0.getAs[Long]("n_docs") == 4 && b0.getAs[Long]("max_len") == 2)
    assert(b0.getAs[Long]("waste_tokens") == 4 * 2 - 6) // pad 1,1,2,2 → 2
    assert(b1.getAs[Long]("n_docs") == 4 && b1.getAs[Long]("max_len") == 10)
    assert(b1.getAs[Long]("waste_tokens") == 4 * 10 - 26)
    // baseline: everything padded to the global max 10
    assert(b0.getAs[Long]("baseline_waste_tokens") == 8 * 10 - 32)
    assert(b0.getAs[Long]("waste_ppm") == 250000L) // 2/8 of the pad grid
    // bucketed waste strictly beats the single bucket
    assert(plan.map(_.getAs[Long]("waste_tokens")).sum
      < b0.getAs[Long]("baseline_waste_tokens"))
    // skewed multiplicities: one length's rows all land in ONE bucket
    val skew = (Seq.fill(90)(5L) ++ Seq.fill(10)(50L)).toDF("len")
    val sp = Packing.lengthBucketPlan(skew, col("len"), 4)
      .orderBy("bucket").collect()
    assert(sp.length == 2) // non-splitting rule collapses empty buckets
    assert(sp.map(_.getAs[Long]("n_docs")).toSeq == Seq(90L, 10L))
    // partitioning invariance
    val re = Packing.lengthBucketPlan(docs.repartition(7), col("len"), 2)
      .orderBy("bucket").collect().map(_.toSeq)
    assert(re.toSeq == plan.map(_.toSeq).toSeq)
  }

  test("shardShuffle: positions contiguous per shard, partition-" +
      "invariant, shard assignment append-stable, order decorrelated " +
      "from key order") {
    import spark.implicits._
    val df = spark.range(0, 2000).toDF("id")
    val sh = Sampling.shardShuffle(df, "id", nShards = 8)
      .select("id", "shard", "pos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(sh.map(_._2).distinct.sorted.toSeq == (0L until 8L))
    // positions are exactly 1..n_b within every shard
    sh.groupBy(_._2).foreach { case (s, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length.toLong),
        s"shard $s positions not contiguous")
    }
    // pure function of the key: partitioning cannot move anything
    val re = Sampling.shardShuffle(df.repartition(17), "id", 8)
      .select("id", "shard", "pos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(re == sh.toSet)
    // append stability of ASSIGNMENT: an appended key never moves an
    // existing key's shard (positions renumber — snapshot-scoped)
    val bigger = Sampling.shardShuffle(
        spark.range(0, 2500).toDF("id"), "id", 8)
      .select("id", "shard")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    sh.foreach { case (id, shard, _) => assert(bigger(id) == shard) }
    // the within-shard order must not replay key order: Spearman-ish
    // check — in at least one shard, pos is not monotone in id
    val monotoneShards = sh.groupBy(_._2).values.count { rows =>
      val byPos = rows.sortBy(_._3).map(_._1)
      byPos.sorted.sameElements(byPos)
    }
    assert(monotoneShards == 0, "order hash degenerated to key order")
  }

  test("shardAudit: balance within 2x at uniform keys, fingerprint " +
      "flips when two rows swap positions") {
    import spark.implicits._
    val docs = spark.range(0, 3000)
      .select($"id", (($"id" % 7) + 1).as("nt"))
    val sharded = Sampling.shardShuffle(docs.toDF("id", "nt"), "id", 8)
    val audit = Sampling.shardAudit(sharded, "id", col("nt"))
      .collect()
    assert(audit.length == 8)
    val nd = audit.map(_.getAs[Long]("n_docs"))
    assert(nd.sum == 3000L && nd.max < 2 * nd.min, nd.toSeq)
    // head/tail really are the pos=1 / pos=max keys
    val byShard = sharded.select("shard", "pos", "id").collect()
      .groupBy(_.getLong(0))
    audit.foreach { r =>
      val rows = byShard(r.getAs[Long]("shard"))
      assert(r.getAs[Long]("head_doc") == rows.minBy(_.getLong(1)).getLong(2))
      assert(r.getAs[Long]("tail_doc") == rows.maxBy(_.getLong(1)).getLong(2))
    }
    // fingerprint sensitivity: swapping two rows' positions in one
    // shard changes that shard's order_fp (pos-weighted sum)
    val tweaked = sharded.withColumn("pos",
      when($"shard" === 0 && $"pos" === 1, 2L)
        .when($"shard" === 0 && $"pos" === 2, 1L)
        .otherwise($"pos"))
    val fp0 = audit.find(_.getAs[Long]("shard") == 0L).get
      .getAs[Long]("order_fp")
    val fp0Tweaked = Sampling.shardAudit(tweaked, "id", col("nt"))
      .filter($"shard" === 0).collect().head.getAs[Long]("order_fp")
    assert(fp0 != fp0Tweaked)
  }

  test("ipfWeights: the uniform 2x2 grid with targets (3,1)/(2,2) " +
      "converges at round 1 to exact 1.5/0.5 weights; margins hit") {
    import spark.implicits._
    val cells = Seq(("a", "x", 1L), ("a", "y", 1L),
      ("b", "x", 1L), ("b", "y", 1L)).toDF("r", "c", "n")
    val rt = Seq(("a", 3L), ("b", 1L)).toDF("r", "tr")
    val ct = Seq(("x", 2L), ("y", 2L)).toDF("c", "tc")
    val out = Sampling.ipfWeights(cells, rt, ct, rounds = 3)
      .collect().map(x => (x.getString(0), x.getString(1)) ->
        (x.getLong(3), x.getLong(4), x.getLong(5))).toMap
    // row scale: a -> 3/2 = 1.5, b -> 1/2; col sums then already 2
    assert(out(("a", "x")) == ((1500000L, 3000000L, 2000000L)))
    assert(out(("a", "y")) == ((1500000L, 3000000L, 2000000L)))
    assert(out(("b", "x")) == ((500000L, 1000000L, 2000000L)))
    assert(out(("b", "y")) == ((500000L, 1000000L, 2000000L)))
  }

  test("bottomKSample: exact size, deterministic under repartition, " +
      "MERGEABLE (bottom-k of shard bottom-ks == global bottom-k), " +
      "KMV estimate within 3/sqrt(k) of the truth") {
    val n = 5000L
    val ids = spark.range(n).select(col("id"))
    def keys(df: org.apache.spark.sql.DataFrame) =
      Sampling.bottomKSample(df, "id", 100)
        .select("id").collect().map(_.getLong(0)).toSet
    val base = keys(ids)
    assert(base.size === 100)
    assert(keys(ids.repartition(17)) === base)
    // mergeability: sample each half independently, union, resample
    val left = Sampling.bottomKSample(ids.filter(col("id") < 2500), "id", 100)
    val right = Sampling.bottomKSample(ids.filter(col("id") >= 2500), "id", 100)
    val merged = keys(left.select("id").union(right.select("id")))
    assert(merged === base, "shard-merge must equal the global sample")
    val est = Sampling.bottomKDistinctEstimate(
        Sampling.bottomKSample(ids, "id", 100), 100)
      .collect().head.getLong(0)
    // KMV rsd ~ 1/sqrt(k-1) = 10%; allow 3 sigma
    assert(math.abs(est - n) < n * 0.3, s"estimate $est vs $n")
  }

  test("weightedBottomK: exact size, deterministic, dominant weight " +
      "always selected, 10x weights ~10x overrepresented") {
    // 500 rows at weight 1, 500 at weight 10, one at 10^6
    val df = spark.range(1001)
      .select(col("id"),
        when(col("id") === 1000L, 1000000L)
          .when(col("id") % 2 === 0, 10L).otherwise(1L).as("wt"))
    val s1 = Sampling.weightedBottomK(df, "id", col("wt"), 100)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(s1.size === 100)
    assert(s1.contains(1000L), "the 10^6-weight row must be drawn")
    val heavy = s1.count(i => i != 1000L && i % 2 == 0)
    val light = s1.count(i => i != 1000L && i % 2 == 1)
    assert(heavy > light * 3,
      s"10x weights must dominate the draw: heavy=$heavy light=$light")
    assert(Sampling.weightedBottomK(df.repartition(13), "id",
      col("wt"), 100).select("id").collect().map(_.getLong(0)).toSet === s1)
  }

  test("rendezvousShard: valid range, deterministic, and the minimal- " +
      "movement contract — growing 8 to 9 shards moves ONLY keys " +
      "whose new argmax IS shard 8, about 1/9 of them") {
    val ids = spark.range(9000).select(col("id"))
    val m = ids.select(col("id"),
        Sampling.rendezvousShard(col("id"), 8).as("s8"),
        Sampling.rendezvousShard(col("id"), 9).as("s9"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(m.forall { case (_, a, b) => a >= 0 && a < 8 && b >= 0 && b < 9 })
    val moved = m.filter { case (_, a, b) => a != b }
    // THE property: every moved key moved TO the new shard
    assert(moved.forall(_._3 == 8), "moved keys must land on the new shard")
    val frac = moved.length.toDouble / m.length
    assert(frac > 0.05 && frac < 0.18, s"moved fraction $frac ~ 1/9")
    // balance: each of the 9 shards holds a nontrivial share
    val byShard = m.groupBy(_._3).map { case (s, v) => s -> v.length }
    assert(byShard.size === 9 && byShard.values.forall(_ > 9000 / 18))
  }

  test("coverageReweight upweights the uncovered source; rounds interact") {
    import spark.implicits._
    // two sources share one distribution, the third is disjoint: the
    // mixture leans toward the shared mass, so the outlier's TV from
    // the mixture is larger and it must gain weight over uniform.
    val docs = (
      (1 to 30).map(i => ("a", s"alpha beta gamma d${i % 5}")) ++
      (1 to 30).map(i => ("b", s"alpha beta gamma d${i % 5}")) ++
      (1 to 30).map(i => ("c", s"omega psi chi x${i % 5}"))
    ).toDF("source", "text")
    def w(rounds: Int) = Sampling
      .coverageReweight(docs, "source", "text", rounds = rounds)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val w2 = w(2)
    assert(w2("c") > 333333L, s"outlier must exceed uniform: $w2")
    assert(w2("c") > w2("a") && w2("a") == w2("b"),
      "symmetric sources stay tied")
    // weights renormalize to ~1e6 (ppm floors lose at most #sources)
    assert(math.abs(w2.values.sum - 1000000L) <= 3)
    // the mixture moves between rounds: round 2 differs from round 1
    assert(w(1) != w2, "static unroll would make rounds a no-op")
  }
}
