package graft

import org.apache.spark.sql.functions._

import graft.operators.{AbTest, Sampling, Stats}

/** Round-10 batch B: grouped ACF and CUPED variance reduction. */
class AcfCupedSpec extends SparkSpec {
  import spark.implicits._

  test("groupedAcf: a strictly period-3 series has ACF(3) exactly 1.0 " +
      "(shifted vector is pointwise identical)") {
    val rows = (0L until 30L).map(b => ("s", b, Seq(5L, 11L, 2L)(
      (b % 3).toInt)))
    val df = rows.toDF("g0", "b0", "v0")
    val acf = Stats.groupedAcf(df, "g0", col("b0"), col("v0"), 6)
      .collect().map(r => r.getInt(1) -> r.getDouble(3)).toMap
    assert(acf(3) == 1.0 && acf(6) == 1.0)
    assert(acf(1) < 0.0, s"off-period lag should anti-correlate: $acf")
  }

  test("groupedAcf zero-fills absent buckets: sparse input equals " +
      "explicitly zero-padded input") {
    val sparse = Seq(("s", 0L, 7L), ("s", 2L, 9L), ("s", 5L, 4L))
      .toDF("g0", "b0", "v0")
    val padded = Seq(("s", 0L, 7L), ("s", 1L, 0L), ("s", 2L, 9L),
      ("s", 3L, 0L), ("s", 4L, 0L), ("s", 5L, 4L)).toDF("g0", "b0", "v0")
    val a = Stats.groupedAcf(sparse, "g0", col("b0"), col("v0"), 3)
    val b = Stats.groupedAcf(padded, "g0", col("b0"), col("v0"), 3)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("groupedAcf: constant series yields NULL (degenerate variance)") {
    val df = (0L until 10L).map(b => ("c", b, 3L)).toDF("g0", "b0", "v0")
    val out = Stats.groupedAcf(df, "g0", col("b0"), col("v0"), 2).collect()
    assert(out.nonEmpty && out.forall(_.isNullAt(3)))
  }

  test("cuped: exactly linear covariate (y = 2x) gives theta 2.0 and " +
      "zero adjusted variance; arms ride the shared hash family") {
    // users 0..7; pre event at sec 10 with value x_u, post at sec 90
    // with value 2*x_u; span 0..100 so tmid = 50
    val xs = Seq(100L, 220L, 340L, 460L, 580L, 700L, 820L, 940L)
    val rows = Seq(("pad", 0L, 0L), ("pad2", 100L, 0L)).map {
      case (_, s2, v) => (999L, s2, v) } ++
      xs.zipWithIndex.flatMap { case (x, u) =>
        Seq((u.toLong, 10L, x), (u.toLong, 90L, 2L * x)) }
    val df = rows.toDF("u0", "sec0", "cents0")
    val out = AbTest.cuped(df, "u0", col("sec0"), col("cents0"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5), r.getDouble(6))).toMap
    out.values.foreach { case (_, _, _, theta, _, varAdj) =>
      assert(theta == 2.0, s"theta $theta")
      assert(math.abs(varAdj) < 1e-6, s"var_y_adj $varAdj")
    }
    // arm of user 999 (the pad user with x=y=0) matches the hash family
    val expArm = Sampling.hashBucketLong(999L, 2)
    val armsSeen = AbTest.cuped(df, "u0", col("sec0"), col("cents0"))
      .collect().map(_.getLong(0)).toSet
    assert(armsSeen.contains(expArm))
  }

  test("cuped preserves the pooled mean and reduces variance on a " +
      "correlated fixture") {
    val rows = (0 until 200).flatMap { u =>
      val x = (u * 37 % 97).toLong + 10L
      val y = x * 3L + (u * 53 % 31).toLong
      Seq((u.toLong, 5L, x), (u.toLong, 95L, y))
    } :+ (9999L, 0L, 0L) :+ (9998L, 100L, 0L)
    val df = rows.toDF("u0", "sec0", "cents0")
    val out = AbTest.cuped(df, "u0", col("sec0"), col("cents0")).collect()
    val rawPool = out.map(r => r.getLong(1) * r.getDouble(2)).sum
    val adjPool = out.map(r => r.getLong(1) * r.getDouble(3)).sum
    assert(math.abs(rawPool - adjPool) < 1e-6,
      s"pooled mean must be invariant: $rawPool vs $adjPool")
    out.foreach { r =>
      assert(r.getDouble(6) < r.getDouble(5),
        s"variance must shrink: ${r.getDouble(6)} vs ${r.getDouble(5)}")
    }
  }

  test("stratifiedAtt: a planted constant effect is recovered exactly " +
      "in every stratum and pooled; treated-only strata are dropped") {
    // arms ride the shared hash family — pick ids per arm up front
    val ids = (0L until 400L)
    val treated = ids.filter(Sampling.hashBucketLong(_, 2) == 1)
    val control = ids.filter(Sampling.hashBucketLong(_, 2) == 0)
    val delta = 700L // planted ATT in cents
    def userRows(u: Long, preN: Int, yCents: Long) =
      (1 to preN).map(_ => (u, 0L, 0L)) :+ ((u, 100L, yCents))
    // stratum LOW: pre_n=1; HIGH: pre_n=9 (mp=9 -> buckets 0 and 3);
    // base outcome differs by stratum (confounding), effect is +delta
    val rows =
      treated.take(3).flatMap(userRows(_, 1, 1000L + delta)) ++
      control.take(3).flatMap(userRows(_, 1, 1000L)) ++
      treated.slice(3, 7).flatMap(userRows(_, 9, 5000L + delta)) ++
      control.slice(3, 7).flatMap(userRows(_, 9, 5000L)) ++
      // stratum pre_n=5 (bucket 2): TREATED ONLY -> no contrast, drop
      treated.slice(7, 9).flatMap(userRows(_, 5, 9999L))
    val df = rows.toDF("u0", "sec0", "cents0")
    val out = AbTest.stratifiedAtt(df, "u0", col("sec0"), col("cents0"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(5), r.getLong(6))).toMap
    assert(out.keySet == Set(0L, 3L), s"supported strata only: $out")
    out.values.foreach { case (_, _, cellAtt, att) =>
      assert(cellAtt == delta * 1000000L, s"cell ATT exact: $out")
      assert(att == delta * 1000000L, s"pooled ATT exact: $out")
    }
  }

  test("stratifiedAtt: uniform pre-period density collapses to one " +
      "top stratum (range-relative cut), still estimable") {
    val ids = (0L until 60L)
    val rows = ids.flatMap { u =>
      (1 to 4).map(_ => (u, 0L, 0L)) :+ ((u, 100L, 2000L))
    }
    val df = rows.toDF("u0", "sec0", "cents0")
    val out = AbTest.stratifiedAtt(df, "u0", col("sec0"), col("cents0"))
      .collect()
    assert(out.length == 1 && out.head.getLong(0) == 3L)
    assert(out.head.getLong(6) == 0L, "no effect planted")
  }

  test("sequentialLooks: a large planted effect crosses both " +
      "boundaries at every look; flags equal |z| vs the published " +
      "constants; a null effect crosses nothing") {
    val ids = (0L until 400L)
    val treated = ids.filter(Sampling.hashBucketLong(_, 2) == 1).take(20)
    val control = ids.filter(Sampling.hashBucketLong(_, 2) == 0).take(20)
    def rows(us: Seq[Long], base: Long) = us.zipWithIndex.flatMap {
      case (u, i) =>
        // span pins: one event at sec 0 and one at 100 per cohort
        Seq((u, if (i == 0) 0L else 10L, base + (u % 5)),
          (u, if (i == 1) 100L else 90L, 0L))
    }
    val eff = (rows(treated, 100000L) ++ rows(control, 0L))
      .toDF("u0", "sec0", "cents0")
    val out = AbTest.sequentialLooks(eff, "u0", col("sec0"),
        col("cents0")).orderBy("look").collect()
    assert(out.length == 4)
    out.foreach { r =>
      val look = r.getInt(0)
      val z = r.getDouble(4)
      val pc = AbTest.PocockC(4)
      val obf = BigDecimal(AbTest.ObfC(4) * math.sqrt(4.0 / look))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getBoolean(5) == (math.abs(z) > pc), s"pocock@$look")
      assert(r.getBoolean(6) == (math.abs(z) > obf), s"obf@$look")
      assert(r.getBoolean(5) && r.getBoolean(6),
        s"planted 1000-cent effect must cross at look $look: z=$z")
    }
    val nul = (rows(treated, 0L) ++ rows(control, 0L))
      .toDF("u0", "sec0", "cents0")
    val nout = AbTest.sequentialLooks(nul, "u0", col("sec0"),
      col("cents0")).collect()
    nout.foreach { r =>
      assert(!r.getBoolean(5) && !r.getBoolean(6),
        s"null effect must not cross: $r")
    }
  }

  test("diffInDiff: a planted treatment lift survives both a level " +
      "gap and a common time trend exactly") {
    val ids = (0L until 400L)
    val treated = ids.filter(Sampling.hashBucketLong(_, 2) == 1).take(5)
    val control = ids.filter(Sampling.hashBucketLong(_, 2) == 0).take(5)
    // control: pre 100 -> post 150 (trend +50); treated: level +100
    // higher AND the same trend, plus the 70-cent effect
    val rows =
      control.flatMap(u => Seq((u, 10L, 100L), (u, 90L, 150L))) ++
      treated.flatMap(u => Seq((u, 10L, 200L), (u, 90L, 320L))) ++
      Seq((control.head, 0L, 0L), (treated.head, 100L, 0L)) // span pins
    val out = AbTest.diffInDiff(rows.toDF("u0", "sec0", "cents0"),
      "u0", col("sec0"), col("cents0")).collect().head
    assert(out.getLong(6) == 70L * 1000000L,
      s"did_micros ${out.getLong(6)}")
  }

  test("groupedAcf is partitioning-invariant on real events") {
    val ev = Tables.events(spark, Sf0001)
    val b = (unix_timestamp(col("ts")) / 3600L).cast("long")
    val v = (col("value").cast("decimal(12,2)") * 100).cast("long")
    val a1 = Stats.groupedAcf(ev, "event_type", b, v, 4)
    val a2 = Stats.groupedAcf(ev.repartition(7), "event_type", b, v, 4)
    assert(a1.exceptAll(a2).isEmpty && a2.exceptAll(a1).isEmpty)
  }
}
