package graft

import org.apache.spark.sql.functions._

import graft.operators.Stats

class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("zscoreOutliers flags planted spikes, is partitioning-invariant") {
    // 200 calm readings near 10.00 plus two planted spikes per group
    val rows =
      (0 until 200).map(i => (i.toLong, "a", 10.0 + (i % 7) * 0.01)) ++
      Seq((900L, "a", 95.5), (901L, "a", -40.25)) ++
      (0 until 200).map(i => (1000L + i, "b", 50.0 + (i % 5) * 0.02)) ++
      Seq((1900L, "b", 50.06)) // within-noise for b, must NOT flag
    val df = rows.toDF("event_id", "event_type", "value")
    val got = Stats.zscoreOutliers(df, "event_type",
        floor(col("value") * 100), 3.0,
        Seq("event_id", "event_type", "value"))
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(got.keySet == Set(900L, 901L))
    assert(got(900L) > 3.0 && got(901L) < -3.0)
    // exact integer sufficient statistics ⇒ identical z under any
    // partitioning (the property a float Welford std would break)
    val re = Stats.zscoreOutliers(df.repartition(13), "event_type",
        floor(col("value") * 100), 3.0,
        Seq("event_id", "event_type", "value"))
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(re == got)
  }

  test("madOutliers: spikes can't mask each other; zscore masked, MAD not") {
    // 20 calm readings + FIVE coordinated big spikes: the spikes drag
    // the classical std up (masking — only some flag at z>3) but
    // median/MAD ignore them entirely
    val rows = (0 until 20).map(i => (i.toLong, "g", 10.0 + (i % 4) * 0.01)) ++
      (900L to 904L).map(i => (i, "g", 500.0))
    val df = rows.toDF("event_id", "event_type", "value")
    val mad = Stats.madOutliers(df, "event_type",
        floor(col("value") * 100), 3.5,
        Seq("event_id", "event_type", "value"))
      .collect().map(_.getLong(0)).toSet
    assert(mad == (900L to 904L).toSet, s"got $mad")
    val classical = Stats.zscoreOutliers(df, "event_type",
        floor(col("value") * 100), 3.0,
        Seq("event_id", "event_type", "value"))
      .collect().map(_.getLong(0)).toSet
    assert(classical.size < 5, // the spikes inflate sd and mask themselves
      s"expected masking in the classical z, got $classical")
    // invariant under repartitioning (discrete order statistics)
    val re = Stats.madOutliers(df.repartition(11), "event_type",
        floor(col("value") * 100), 3.5,
        Seq("event_id", "event_type", "value"))
      .collect().map(_.getLong(0)).toSet
    assert(re == mad)
    // a group where >half the values are identical (MAD=0) flags nothing
    val deg = (0 until 30).map(i => (i.toLong, "h", 5.0)) ++
      Seq((99L, "h", 80.0))
    assert(Stats.madOutliers(deg.toDF("event_id", "event_type", "value"),
      "event_type", floor(col("value") * 100), 3.5,
      Seq("event_id")).count() == 0L)
  }

  test("fused MAD localization == definitional median/MAD on adversarial shapes") {
    // The one-histogram MAD brackets the dev-median from xl-bucket
    // metadata (lb/ub + exact below-offset). Hammer exactly the cases
    // where that localization could slip: ties at the median and at
    // the MAD boundary, all mass in one bucket, far-apart bimodal
    // clusters (dev bracket spans distant buckets), huge ranges
    // (bucket width ≫ 1), negatives, and 1–2 element groups.
    val gnarly: Seq[(Long, String, Double)] =
      // heavy ties: half at 10.00, rest split on two values
      (0 until 50).map(i => (i.toLong, "ties", 10.0)) ++
        (50 until 80).map(i => (i.toLong, "ties", 10.07)) ++
        (80 until 100).map(i => (i.toLong, "ties", 250.0)) ++
        // bimodal, clusters 1e6 apart
        (0 until 40).map(i => (200L + i, "bimodal", 5.0 + (i % 3) * 0.01)) ++
        (0 until 40).map(i => (300L + i, "bimodal", 1e6 + (i % 5) * 0.02)) ++
        Seq((399L, "bimodal", 5e5)) ++ // lone midpoint row
        // huge range: uniform-ish spread over ±1e9 cents
        (0 until 90).map(i => (400L + i.toLong, "huge",
          -1e7 + i * 217543.21)) ++
        Seq((499L, "huge", 9e7)) ++
        // tiny groups
        Seq((600L, "one", 42.0), (700L, "two", 1.0), (701L, "two", 2.0))
    val df = gnarly.toDF("event_id", "event_type", "value")
    val got = Stats.madOutliers(df, "event_type",
        floor(col("value") * 100), 3.5,
        Seq("event_id", "event_type", "value"))
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // driver-side definitional reference, op-for-op the same arithmetic
    val ref = gnarly.groupBy(_._2).flatMap { case (_, rows) =>
      val xs = rows.map(t => t._1 -> math.floor(t._3 * 100).toLong)
      def disc(v: Seq[Long]): Long = {
        val s = v.sorted
        s(math.max(math.ceil(0.5 * s.length).toInt, 1) - 1)
      }
      val med = disc(xs.map(_._2))
      val mad = disc(xs.map(t => math.abs(t._2 - med)))
      if (mad == 0L) Nil
      else xs.map { case (id, xl) =>
        id -> 0.6745 * (xl - med).toDouble / mad.toDouble
      }.filter(t => math.abs(t._2) > 3.5)
    }
    assert(got == ref, s"got=$got\nref=$ref")
  }

  test("approxPercentileRankMilli: never above the true strict-below " +
      "rank, within its own bucket's mass of it, monotone in value") {
    val ev = Tables.events(spark, Sf0001)
    val xi = floor(col("value") * 100)
    val approx = Stats.approxPercentileRankMilli(ev, "event_type", xi,
        Seq("event_id", "event_type", "value"))
      .collect().map(r => r.getLong(0) -> (r.getString(1),
        math.floor(r.getDouble(2) * 100).toLong, r.getLong(3))).toMap
    // driver-side exact strict-below fraction per group
    val byGroup = approx.toSeq.groupBy(_._2._1)
    byGroup.foreach { case (_, rows) =>
      val xs = rows.map(_._2._2).sorted
      val n = xs.length.toDouble
      // a row's approx rank (its bucket's cumulative start) never
      // exceeds its exact strict-below rank (plus milli floor slack)
      rows.foreach { case (_, (_, x, milli)) =>
        val exact = xs.count(_ < x) / n * 1000.0
        assert(milli <= exact + 1.0, s"overshoot: $milli vs $exact")
      }
      // monotone: sort rows by value, approx rank never decreases
      val sorted = rows.sortBy(_._2._2).map(_._2._3)
      assert(sorted.sliding(2).forall(w => w.head <= w.last))
    }
  }

  test("groupedQuantilesDisc matches a driver-side sorted reference") {
    val li = Tables.lineitem(spark, Sf0001)
    val got = Stats.groupedQuantilesDisc(
      li, "l_returnflag", "l_extendedprice", Seq(0.25, 0.5, 0.75))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val byFlag = li.select("l_returnflag", "l_extendedprice").collect()
      .groupBy(_.getString(0)).map { case (f, rows) =>
        val v = rows.map(_.getDouble(1)).sorted
        def disc(p: Double) = v(math.max(math.ceil(p * v.length).toInt, 1) - 1)
        f -> (disc(0.25), disc(0.5), disc(0.75))
      }
    assert(got == byFlag)
  }

  test("selection-based quantiles == sort-based, at sf0.001 and sf0.01") {
    for (sf <- Seq(Sf0001, Sf001)) {
      val li = Tables.lineitem(spark, sf)
      val ps = Seq(0.25, 0.5, 0.75, 0.95)
      val sorted = Stats.groupedQuantilesDisc(
        li, "l_returnflag", "l_extendedprice", ps)
        .orderBy("l_returnflag").collect().toSeq
      val selected = Stats.groupedQuantilesSelect(
        li, "l_returnflag", "l_extendedprice", ps)
        .orderBy("l_returnflag").collect().toSeq
      assert(selected == sorted, sf)
      // the high-group-cardinality rendering (shuffle joins instead of
      // broadcasts) selects the identical elements
      val shuffled = Stats.groupedQuantilesSelect(
        li, "l_returnflag", "l_extendedprice", ps, broadcastMeta = false)
        .orderBy("l_returnflag").collect().toSeq
      assert(shuffled == sorted, sf)
    }
  }

  test("pearsonExact is bitwise-stable under repartitioning") {
    val li = Tables.lineitem(spark, Sf0001)
    val a = Stats.pearsonExact(li, "l_returnflag", "l_quantity", "l_extendedprice")
      .orderBy("l_returnflag").collect().toSeq
    val b = Stats.pearsonExact(li.repartition(13),
        "l_returnflag", "l_quantity", "l_extendedprice")
      .orderBy("l_returnflag").collect().toSeq
    assert(a == b)
    // and close to MLlib's float-sum corr (sanity, not bitwise)
    val c = li.groupBy("l_returnflag")
      .agg(corr("l_quantity", "l_extendedprice").as("c"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    a.foreach(r =>
      assert(math.abs(r.getDouble(1) - c(r.getString(0))) < 1e-9))
  }

  test("cusumMeanShift recovers a planted level shift exactly") {
    import graft.operators.Changepoint
    // 30 periods at 1000 cents, then 30 at 3000: split at period 30
    val rows = (1 to 60).map(i =>
      (java.sql.Date.valueOf(f"2024-01-01").toLocalDate.plusDays(i),
        if (i <= 30) 1000L else 3000L))
      .map { case (d, v) => (java.sql.Date.valueOf(d), v) }
    val df = rows.toDF("t", "cents")
    val out = Changepoint.cusumMeanShift(df, col("t"), col("cents"))
      .collect().head
    assert(out.getDate(0).toString === "2024-01-31") // last BEFORE period
    assert(out.getLong(1) === 60L)
    assert(out.getLong(3) === 1000L && out.getLong(4) === 3000L)
  }

  test("hllOverlapMatrix pairwise rows agree with hllOverlap") {
    import graft.operators.Sketch
    val a = (1 to 300).map(i => ("a", i.toLong))
    val b = (151 to 450).map(i => ("b", i.toLong))
    val c = (1000 to 1100).map(i => ("c", i.toLong))
    val df = (a ++ b ++ c).toDF("g", "k")
    val m = Sketch.hllOverlapMatrix(df, "g", "k")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    val ab = Sketch.hllOverlap(
        df.filter(col("g") === "a"), df.filter(col("g") === "b"), "k")
      .collect().head
    assert(m(("a", "b")) ===
      ((ab.getLong(0), ab.getLong(1), ab.getLong(2), ab.getLong(3))))
    // disjoint pair: intersection estimate collapses to ~0
    val (_, _, _, interAc) = m(("a", "c"))
    assert(interAc < 30, s"disjoint inter est $interAc")
  }

  test("bootstrapMeanCi: CI brackets the mean, narrows with n, and " +
      "is partitioning-invariant") {
    def data(n: Int) = (1 to n)
      .map(i => ("g", i.toLong, ((i % 100) + 1) * 100L))
      .toDF("g", "k", "cents")
    def ci(df: org.apache.spark.sql.DataFrame) =
      Stats.bootstrapMeanCi(df, "g", col("k"), col("cents"))
        .collect().map(r => (r.getLong(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4))).head
    val (n1, m1, lo1, hi1) = ci(data(400))
    assert(lo1 < m1 && m1 < hi1, s"bracket: $lo1 $m1 $hi1")
    // degenerate 1-row group: ~37% of replicates draw total weight 0
    // and fall back to the group mean — all 40 order-statistic slots
    // stay occupied, so the CI is the point value, never NULL
    val (n0, m0, lo0, hi0) = ci(data(1))
    assert(n0 === 1L && lo0 === m0 && hi0 === m0,
      s"degenerate group must collapse to the point mean: $lo0 $m0 $hi0")
    val (_, m2, lo2, hi2) = ci(data(6400))
    assert(hi2 - lo2 < hi1 - lo1, "width shrinks with n")
    assert(ci(data(400).repartition(13)) === ((n1, m1, lo1, hi1)))
  }

  test("holtLinearSummary: zero error on an exact linear trend (the " +
      "property a plain EWMA cannot have), naive pays |slope| per step") {
    // x_t = 1000 + 50·t: after init (l=x₁, b=50 exact) every forecast
    // l+b equals the next point exactly, and the integer state updates
    // reproduce (l_t, b_t) = (x_t, 50) with no rounding residue.
    val lin = (0 until 30).map(t => (t, 1000L + 50L * t)).toDF("t", "x")
    val r = Stats.holtLinearSummary(lin, "t", "x").collect().head
    assert(r.getAs[Long]("n_scored") === 28L)
    assert(r.getAs[Long]("sae_holt") === 0L)
    assert(r.getAs[Long]("sae_naive") === 28L * 50L)
    assert(r.getAs[Long]("skill_micros") === 0L)
    assert(r.getAs[Long]("level_end") === 1000L + 50L * 29L)
    assert(r.getAs[Long]("trend_end") === 50L)
  }

  test("holtLinearSummary: matches an independent reference fold " +
      "(truncating division, negative dips included) and beats naive " +
      "on a noisy trend") {
    val xs = Array(100L, 203L, 351L, 702L, 401L, 999L, 1L, 555L, 620L,
      700L, 651L, 790L, 905L, 870L, 1001L)
    // independent imperative replay of the documented recursion
    def tdiv(a: Long, n: Long): Long = a / n // JVM long division truncates
    var (l, b, prev, sh, sn) = (xs(1), xs(1) - xs(0), xs(1), 0L, 0L)
    xs.drop(2).foreach { x =>
      val f = l + b
      sh += math.abs(x - f); sn += math.abs(x - prev)
      val l2 = tdiv(x + 4 * f, 5)
      b = tdiv((l2 - l) + 9 * b, 10); l = l2; prev = x
    }
    val df = xs.zipWithIndex.toSeq.map { case (x, t) => (t, x) }
      .toDF("t", "x")
    val r = Stats.holtLinearSummary(df, "t", "x").collect().head
    assert(r.getAs[Long]("sae_holt") === sh)
    assert(r.getAs[Long]("sae_naive") === sn)
    assert(r.getAs[Long]("level_end") === l)
    assert(r.getAs[Long]("trend_end") === b)
    // partitioning invariance: the series collects to one fold
    val r13 = Stats.holtLinearSummary(df.repartition(13), "t", "x")
      .collect().head
    assert(r13 === r)
  }

  test("groupedHoltSummary: each group's fold equals the global " +
      "operator run on that group alone; linear groups score zero") {
    // group A: exact linear (zero Holt error); group B: noisy
    val rows = (0 until 20).map(t => ("A", t.toLong, 500L + 25L * t)) ++
      Seq(100L, 203L, 351L, 702L, 401L, 999L, 1L, 555L, 620L, 700L)
        .zipWithIndex.map { case (x, t) => ("B", t.toLong, x) }
    val df = rows.toDF("g", "t", "x")
    val grouped = Stats.groupedHoltSummary(df, "g", "t", "x")
      .collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    for (g <- Seq("A", "B")) {
      val solo = Stats.holtLinearSummary(
          df.filter(col("g") === g).select("t", "x"), "t", "x")
        .select("n_scored", "sae_holt", "sae_naive", "skill_micros",
          "level_end", "trend_end")
        .collect().head.toSeq
      assert(grouped(g).take(6) === solo, s"group $g")
    }
    assert(grouped("A")(1) === 0L, "linear group: zero Holt error")
    // forecast_next = level + trend
    assert(grouped("A")(6) === 500L + 25L * 19 + 25L)
  }

  test("simpsonAudit: planted paradox — every segment trends down, " +
      "the pooled scatter trends up, both flagged") {
    // segment A occupies early days at a low level, B late days at a
    // high level; within each, y falls 1/day. Pooling the points, the
    // later (B) points sit higher ⇒ pooled slope is positive: the
    // textbook composition flip.
    val rows = (0 until 10).map(t => ("A", t.toLong, 100L - t)) ++
      (10 until 20).map(t => ("B", t.toLong, 220L - t))
    val df = rows.toDF("g", "t", "y")
    val m = Stats.simpsonAudit(df, "g", col("t"), col("y"))
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(m("A")._1 === -1.0 && m("B")._1 === -1.0)
    assert(m("A")._2 > 0, s"pooled must flip positive: ${m("A")._2}")
    assert(m("A")._3 && m("B")._3, "both segments must flag the flip")
    // no-paradox control: same trend, same level → no flags
    val ctrl = (0 until 20).flatMap(t =>
      Seq(("A", t.toLong, 50L + t), ("B", t.toLong, 50L + t)))
      .toDF("g", "t", "y")
    val c = Stats.simpsonAudit(ctrl, "g", col("t"), col("y"))
      .collect().map(_.getBoolean(4))
    assert(c.forall(_ == false))
  }
}
