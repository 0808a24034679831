package graft

import org.apache.spark.sql.functions._

import graft.operators.{Conformal, Dedup, Geo}

/** Grid-cell spatial joins (Geo), TF-weighted Jaccard (Dedup), and
  * split-conformal intervals (Conformal): each checked against a
  * brute-force or hand-computed twin, including the cases the grid /
  * integer contracts are most likely to get wrong — negative
  * coordinates (floor vs truncate), cell-boundary pairs, argmin ties,
  * and multiset-vs-set similarity divergence.
  */
class GeoConformalSpec extends SparkSpec {
  import spark.implicits._

  /** 60 deterministic scatter points spanning NEGATIVE and positive
    * coordinates (floorDiv regression bait) with a few exact
    * cell-boundary twins.
    */
  private def scatter = {
    val pts = (1 to 60).map { i =>
      val h = (i.toLong * 784320987L + 423187231L) % 1000000007L
      (i.toLong, h % 200000L - 100000L, (h * h % 1000000007L) % 200000L - 100000L)
    } ++ Seq(
      (101L, 0L, 0L), (102L, -1L, 0L),          // straddle cell edge
      (103L, 49999L, 0L), (104L, 50001L, 0L),   // inside vs outside r=50k along an axis? (within: dx=2)
      (105L, -50000L, -50000L))
    pts.toDF("id", "lat", "lon")
  }

  private def bruteRadius(r: Long) = {
    val p = scatter
    val a = p.select(col("id").as("id_a"), col("lat").as("la"), col("lon").as("loa"))
    val b = p.select(col("id").as("id_b"), col("lat").as("lb"), col("lon").as("lob"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("dist2",
        (col("la") - col("lb")) * (col("la") - col("lb")) +
          (col("loa") - col("lob")) * (col("loa") - col("lob")))
      .filter(col("dist2") <= lit(r * r))
      .select("id_a", "id_b", "dist2")
  }

  test("radiusJoin == brute force on negative/boundary coords, each pair once") {
    val r = 50000L
    val got = Geo.radiusJoin(scatter, "id", "lat", "lon", r)
      .orderBy("id_a", "id_b").collect().toSeq
    val want = bruteRadius(r).orderBy("id_a", "id_b").collect().toSeq
    assert(got.nonEmpty && got == want)
    // no duplicate pair from the 9-cell replication
    assert(got.map(row => (row.getLong(0), row.getLong(1))).distinct.size
      == got.size)
  }

  test("nearestWithin: complete argmin, tie broken to smaller site id, uncovered omitted") {
    val sites = Seq(
      (10L, 0L, 100L), (11L, 0L, -100L),  // equidistant from origin query
      (12L, 900000L, 900000L)             // far away
    ).toDF("sid", "lat", "lon")
    val queries = Seq(
      (1L, 0L, 0L),          // tie between 10 and 11 -> site 10
      (2L, 0L, 150L),        // nearest = 10 at 50^2
      (3L, 500000L, 500000L) // nothing within radius -> omitted
    ).toDF("qid", "lat", "lon")
    val got = Geo.nearestWithin(queries, "qid", sites, "sid",
      "lat", "lon", radius = 10000L)
      .orderBy("qid")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 10L, 10000L), (2L, 10L, 2500L)))
  }

  test("nearestWithin == brute-force argmin on the scatter") {
    val r = 80000L
    val q0 = scatter.select(col("id").as("qid"),
      col("lat"), col("lon")).filter(col("qid") <= 30)
    val s0 = scatter.select(col("id").as("sid"),
      col("lat"), col("lon")).filter(col("sid") > 30)
    val got = Geo.nearestWithin(q0, "qid", s0, "sid", "lat", "lon", r)
      .orderBy("qid").collect().toSeq
    val cand = q0.select(col("qid"), col("lat").as("qla"), col("lon").as("qlo"))
      .crossJoin(s0.select(col("sid"), col("lat").as("sla"), col("lon").as("slo")))
      .withColumn("dist2",
        (col("qla") - col("sla")) * (col("qla") - col("sla")) +
          (col("qlo") - col("slo")) * (col("qlo") - col("slo")))
      .filter(col("dist2") <= lit(r * r))
    val want = cand
      .groupBy("qid")
      .agg(min(struct(col("dist2"), col("sid"))).as("best"))
      .select(col("qid"), col("best.sid").as("site_id"),
        col("best.dist2").as("dist2"))
      .orderBy("qid").collect().toSeq
    assert(got.nonEmpty && got == want)
  }

  test("knnWithin == brute-force window top-k, partial groups returned as-is") {
    import org.apache.spark.sql.expressions.Window
    val r = 80000L
    val q0 = scatter.select(col("id").as("qid"),
      col("lat"), col("lon")).filter(col("qid") <= 30)
    val s0 = scatter.select(col("id").as("sid"),
      col("lat"), col("lon")).filter(col("sid") > 30)
    val got = Geo.knnWithin(q0, "qid", s0, "sid", "lat", "lon", r, k = 3)
      .orderBy("qid", "rn").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getInt(3))).toSeq
    val cand = q0.select(col("qid"), col("lat").as("qla"), col("lon").as("qlo"))
      .crossJoin(s0.select(col("sid"), col("lat").as("sla"), col("lon").as("slo")))
      .withColumn("dist2",
        (col("qla") - col("sla")) * (col("qla") - col("sla")) +
          (col("qlo") - col("slo")) * (col("qlo") - col("slo")))
      .filter(col("dist2") <= lit(r * r))
    val want = cand
      .withColumn("rn", row_number().over(
        Window.partitionBy("qid").orderBy(col("dist2"), col("sid"))))
      .filter(col("rn") <= 3)
      .select(col("qid"), col("sid"), col("dist2"), col("rn"))
      .orderBy("qid", "rn").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getInt(3))).toSeq
    assert(got.nonEmpty && got == want)
    // ranks are contiguous 1..n and capped at k
    got.groupBy(_._1).values.foreach { g =>
      assert(g.map(_._4).sorted == (1 to g.size) && g.size <= 3)
    }
    // partial groups (fewer than k in radius) surface as-is: shrink the
    // radius until some covered query has < 3 candidates and re-check
    val tight = Geo.knnWithin(q0, "qid", s0, "sid", "lat", "lon", 40000L, k = 3)
      .collect().map(x => (x.getLong(0), x.getInt(3))).toSeq
    assert(tight.nonEmpty && tight.groupBy(_._1).exists(_._2.size < 3))
  }

  test("cellDensity: counts partition the point set; negative coords floor correctly") {
    val rows = Geo.cellDensity(scatter, "lat", "lon", 50000L)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(rows.values.sum == scatter.count())
    // (-1, 0) must land in cell (-1, 0), NOT truncate to (0, 0)
    assert(rows.keySet.contains((-1L, 0L)))
    val cnt = scatter.filter(col("lat") >= -50000L && col("lat") < 0L &&
      col("lon") >= 0L && col("lon") < 50000L).count()
    assert(rows((-1L, 0L)) == cnt)
  }

  test("dbscan: core/border/noise taxonomy, min-label border tie, isolated core cluster") {
    // cluster A: 1,2,3,4 mutually within eps=10 (minPts=4, self-inclusive)
    // cluster B: 11,12,13,14 likewise, far from A
    // border 20: within eps of core 4 (A) and core 11 (B) -> min label = A's
    // noise 30: within eps of only the border point
    // isolated core trio 41,42,43: minPts=3 run separately below
    val pts = Seq(
      (1L, 0L, 0L), (2L, 0L, 5L), (3L, 5L, 0L), (4L, 5L, 5L),
      (11L, 100L, 100L), (12L, 100L, 105L), (13L, 105L, 100L), (14L, 105L, 105L),
      (20L, 11L, 11L),   // dist to 4: 6^2+6^2=72 <= 100; to 11: 89^2+89^2 no
      (30L, 18L, 18L)    // dist to 20: 7^2+7^2=98 <= 100, to cores > eps
    ).toDF("id", "lat", "lon")
    val got = Geo.dbscan(pts, "id", "lat", "lon", eps = 10L, minPts = 4)
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    // 20 is border of A (core neighbor 4); 30 is noise (only neighbor 20
    // is non-core... 20 has neighbors 4,30 -> nbrs+1 = 3 < 4 -> border)
    assert(got == Seq(
      (1L, 1L, true), (2L, 1L, true), (3L, 1L, true), (4L, 1L, true),
      (11L, 11L, true), (12L, 11L, true), (13L, 11L, true), (14L, 11L, true),
      (20L, 1L, false)))
  }

  test("dbscan: border touching TWO clusters takes the MIN cluster label") {
    // two collinear 4-point clusters; 20=(17,5) has exactly two core
    // neighbors, 4 (89 <= 100) and 11 (74 <= 100) — one per cluster —
    // so nbrs+1 = 3 < minPts=4 keeps it border, and the min-label rule
    // must pick cluster 1, not 11; 30 is isolated noise
    val pts = Seq(
      (1L, 0L, 0L), (2L, 3L, 0L), (3L, 6L, 0L), (4L, 9L, 0L),
      (11L, 24L, 0L), (12L, 27L, 0L), (13L, 30L, 0L), (14L, 33L, 0L),
      (20L, 17L, 5L), (30L, 17L, 30L)
    ).toDF("id", "lat", "lon")
    val full = Geo.dbscan(pts, "id", "lat", "lon", eps = 10L, minPts = 4)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getBoolean(2)))).toMap
    assert(full(20L) == ((1L, false)), s"border 20 -> ${full(20L)}")
    assert(Seq(1L, 2L, 3L, 4L).forall(full(_) == ((1L, true))))
    assert(Seq(11L, 12L, 13L, 14L).forall(full(_) == ((11L, true))))
    assert(!full.contains(30L) && full.size == 9)
  }

  test("weightedJaccardPairs sees repetition where set Jaccard cannot") {
    val docs = Seq(
      (1L, "a a a a b"),   // tf(a)=4
      (2L, "a b"),         // set-identical to 1, weight-divergent
      (3L, "a a a a b")    // true multiset dup of 1
    ).toDF("doc_id", "text")
    val got = Dedup.weightedJaccardPairs(docs, "doc_id", "text",
        minSimPpm = 0L, maxTokenDocFreq = 100)
      .orderBy("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(5))).toSeq
    // wJ(1,2) = (1+1)/(4+1) = 0.4; wJ(1,3) = 1.0; set Jaccard = 1.0 for all
    assert(got == Seq((1L, 2L, 400000L), (1L, 3L, 1000000L),
      (2L, 3L, 400000L)))
  }

  test("weightedJaccard df cap drops the token from numerator AND totals") {
    val docs = Seq(
      (1L, "x u"), (2L, "x v"), (3L, "x w"),
      (4L, "x u")) // x appears in 4 docs
    .toDF("doc_id", "text")
    val got = Dedup.weightedJaccardPairs(docs, "doc_id", "text",
        minSimPpm = 0L, maxTokenDocFreq = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(5))).toSeq
    // with x df-capped out, only (1,4) still share a token: wJ = 1/1
    assert(got == Seq((1L, 4L, 1000000L)))
  }

  test("ipv4ToLong: valid parses, malformed -> null, round trip with longToIpv4") {
    import graft.operators.IpOps
    val cases = Seq(
      "0.0.0.0", "255.255.255.255", "10.64.128.7", "1.2.3.4",
      "256.1.1.1",      // octet out of range
      "1.2.3",          // too few parts
      "1.2.3.4.5",      // too many parts
      "a.b.c.d", "1.2.3.x", "", "1.2.3.-4", "1.2.3.+4")
    val got = cases.toDF("s")
      .select(col("s"), IpOps.ipv4ToLong(col("s")).as("ip"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got("0.0.0.0").contains(0L))
    assert(got("255.255.255.255").contains(4294967295L))
    assert(got("10.64.128.7").contains(
      10L * 16777216 + 64L * 65536 + 128L * 256 + 7))
    assert(Seq("256.1.1.1", "1.2.3", "1.2.3.4.5", "a.b.c.d", "1.2.3.x",
      "", "1.2.3.-4", "1.2.3.+4").forall(got(_).isEmpty))
    // round trip long -> string -> long is identity on the corners
    val rt = Seq(0L, 4294967295L, 167772160L, 3232235521L).toDF("ip")
      .select(col("ip"),
        IpOps.ipv4ToLong(IpOps.longToIpv4(col("ip"))).as("back"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rt.forall { case (a, b) => a == b })
  }

  test("cidrLookupJoin: longest prefix wins, /32 exact, /0 default, no-match nulls") {
    import graft.operators.IpOps
    val rules = Seq(
      IpOps.parseCidr("0.0.0.0/0", "default"),
      IpOps.parseCidr("10.0.0.0/8", "corp"),
      IpOps.parseCidr("10.1.0.0/16", "dc"),
      IpOps.parseCidr("10.1.2.3/32", "pin"))
    val ips = Seq(
      ("a", "10.1.2.3"),   // /32
      ("b", "10.1.9.9"),   // /16
      ("c", "10.9.9.9"),   // /8
      ("d", "11.0.0.1"),   // /0
      ("e", "bogus")       // parse null -> no match (joins miss on null)
    ).toDF("tag", "s")
    val got = IpOps.cidrLookupJoin(
        ips.select(col("tag"), IpOps.ipv4ToLong(col("s")).as("ip")), "ip",
        rules)
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(2)) null else r.getString(2))).toMap
    assert(got == Map("a" -> "pin", "b" -> "dc", "c" -> "corp",
      "d" -> "default", "e" -> null))
    // duplicate rule at a length is rejected eagerly
    intercept[IllegalArgumentException] {
      IpOps.cidrLookupJoin(ips.limit(1)
        .select(IpOps.ipv4ToLong(col("s")).as("ip")), "ip",
        Seq(IpOps.parseCidr("10.0.0.0/8", "x"),
          IpOps.parseCidr("10.0.0.1/8", "y"))) // same base after masking
    }
  }

  test("splitConformal: coverage near 1 - alpha, k is the finite-sample ceiling") {
    val e = Tables.events(spark, Sf001).select(
      col("event_id"), col("event_type"),
      expr("unix_timestamp(ts) div 3600 % 24").as("hr"),
      (col("value").cast("decimal(12,2)") * 100).cast("long").as("cents"))
    val rows = Conformal.splitConformal(
      e, "event_id", "event_type", "hr", "cents", alphaPpm = 100000L)
      .collect()
    assert(rows.length >= 3)
    rows.foreach { r =>
      val nCal = r.getLong(1)
      val covPpm = r.getLong(5)
      // finite-sample conformal: expected coverage in [1-a, 1-a + 1/(n+1)];
      // allow sampling noise around it on the eval third
      assert(covPpm > 850000L && covPpm < 980000L,
        s"${r.getString(0)}: coverage_ppm $covPpm outside sane band")
      assert(nCal > 100)
    }
  }

  test("splitConformal qhat is exactly the k-th smallest calibration residual") {
    val e = Tables.events(spark, Sf0001).select(
      col("event_id"), col("event_type"),
      expr("unix_timestamp(ts) div 3600 % 24").as("hr"),
      (col("value").cast("decimal(12,2)") * 100).cast("long").as("cents"))
    val got = Conformal.splitConformal(
      e, "event_id", "event_type", "hr", "cents", alphaPpm = 250000L)
      .orderBy("grp").collect()
    // replay: fit means, calibration residuals, manual order statistic
    val fit = e.filter(pmod(col("event_id"), lit(3L)) === 0)
      .groupBy("event_type", "hr")
      .agg(expr("sum(cents) div count(1)").as("yhat"))
    val cal = e.filter(pmod(col("event_id"), lit(3L)) === 1)
      .join(fit, Seq("event_type", "hr"))
      .select(col("event_type"), abs(col("cents") - col("yhat")).as("r"),
        col("event_id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    got.foreach { row =>
      val grp = row.getString(0)
      val rs = cal.filter(_._1 == grp).sortBy(t => (t._2, t._3)).map(_._2)
      val k = (((rs.length + 1) * 750000L) + 999999L) / 1000000L
      assert(row.getLong(1) == rs.length)
      assert(row.getLong(2) == rs((k - 1).toInt), s"$grp qhat mismatch")
    }
  }

  test("Geo guards: oversized radius rejected, coordinate past 2^30-1 raises per-row") {
    intercept[IllegalArgumentException] {
      Geo.radiusJoin(scatter, "id", "lat", "lon", Geo.MaxRadius + 1)
    }
    // a coordinate past the bound must raise, not silently wrap dist2
    val bad = Seq((1L, Geo.MaxCoord + 1, 0L), (2L, 0L, 0L))
      .toDF("id", "lat", "lon")
    val ex = intercept[Exception] {
      Geo.radiusJoin(bad, "id", "lat", "lon", 100L).collect()
    }
    assert(ex.getMessage != null)
    // at the bound itself everything still works exactly
    val edge = Seq((1L, Geo.MaxCoord, Geo.MaxCoord),
      (2L, Geo.MaxCoord - 3, Geo.MaxCoord - 4)).toDF("id", "lat", "lon")
    val got = Geo.radiusJoin(edge, "id", "lat", "lon", 100L).collect()
    assert(got.length == 1 && got(0).getLong(2) == 25L)
  }

  test("cidrLookupJoin rejects direct CidrRules with host bits / masked-prefix aliases") {
    import graft.operators.IpOps
    val ips = Seq(("a", "10.0.0.1")).toDF("tag", "s")
      .select(col("tag"), IpOps.ipv4ToLong(col("s")).as("ip"))
    // nonzero host bits below the prefix — parseCidr would zero them,
    // direct construction must be rejected, not silently alias
    intercept[IllegalArgumentException] {
      IpOps.cidrLookupJoin(ips, "ip",
        Seq(IpOps.CidrRule(10L * 16777216L + 1L, 8, "x")))
    }
    // two rules distinct in raw base but identical once masked
    intercept[IllegalArgumentException] {
      IpOps.cidrLookupJoin(ips, "ip",
        Seq(IpOps.CidrRule(10L * 16777216L, 8, "x"),
          IpOps.CidrRule(10L * 16777216L + 256L, 8, "y")))
    }
  }

  test("hot-cell radius join: AQE skew-split ENGAGES and results are unchanged") {
    // Geo.scala's 100 TB contract leans on AQE skew-split for hot
    // cells; q_geo_radius_skew plants one (50% of points in a single
    // 50k-cell). Prove the runtime mechanism actually fires on that
    // fixture — thresholds scaled to fixture bytes; production
    // partition sizes trip the 256MB default the same way — and that
    // the split changes NOTHING about the result (partitioning
    // invariance under skew handling).
    // repartition(16): AQE splits a skewed reduce partition by MAP
    // index ranges, so a single-mapper input (one small parquet file)
    // is UNSPLITTABLE no matter the thresholds — production scans
    // have thousands of mappers; the fixture must too.
    val pts = Queries.geoSkewPoints(spark, Sf001).repartition(16, col("id"))
    def degreeProfile() =
      graft.operators.Geo.radiusJoin(pts, "id", "lat", "lon", 50000L)
        .groupBy("id_a").agg(count(lit(1)).as("n"), sum("dist2").as("s"))
        .orderBy("id_a")
    val base = degreeProfile().collect().toSeq
    assert(base.nonEmpty)
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val df = degreeProfile()
      val got = df.collect().toSeq
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"skew-split did not engage on the hot-cell join:\n$plan")
      assert(got == base,
        "skew-split changed the radius-join result")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("splitConformal fit mean FLOORS on signed values (DuckDB // parity)") {
    // group (g, hr=0) split-0 rows sum to -7 over 2 rows: floor(-3.5)
    // = -4 (DuckDB -7 // 2), while truncation would give -3. Residuals
    // and coverage then differ between the two conventions, so pin the
    // qhat: split-0 ids 0,3 (values -3,-4), split-1 ids 1,4, split-2
    // ids 2,5.
    val rows = Seq(
      (0L, "g", 0L, -3L), (3L, "g", 0L, -4L),  // fit: yhat = -4
      (1L, "g", 0L, -4L), (4L, "g", 0L, -1L),  // cal: r = 0, 3
      (2L, "g", 0L, -4L), (5L, "g", 0L, -9L)   // eval: |.-yhat| = 0, 5
    ).toDF("id", "grp", "hr", "v")
    val out = Conformal.splitConformal(rows, "id", "grp", "hr", "v",
      alphaPpm = 500000L).collect()
    assert(out.length == 1)
    // n_cal = 2, k = ceil(3 * 0.5) = 2 -> qhat = 2nd smallest residual = 3
    assert(out(0).getLong(1) == 2L)
    assert(out(0).getLong(2) == 3L, "qhat must come from FLOORED yhat = -4")
    // eval: residuals 0 and 5 vs qhat 3 -> 1 of 2 covered
    assert(out(0).getLong(3) == 2L && out(0).getLong(4) == 1L)
  }
}
