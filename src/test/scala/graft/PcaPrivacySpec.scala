package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Pca, Privacy}

/** Power-iteration PCA (known-direction recovery, partitioning
  * invariance, zero-variance guard) and the privacy profile
  * (k-anonymity minimum, l-diversity, rows-at-risk).
  */
class PcaPrivacySpec extends SparkSpec {
  import spark.implicits._

  // points along direction (3,4)/5 in 4-d space plus small fixed
  // off-axis jitter: PC1 must recover (0.6, 0.8, 0, 0) up to sign
  lazy val line: DataFrame = (-20 to 20).map { i =>
    val t = i.toDouble
    Array(0.6 * t + 0.01 * (i % 3), 0.8 * t, 0.02 * (i % 2), 0.0)
  }.toDF("embedding")

  private def pc1(df: DataFrame): Seq[(Int, Long, Long, Long)] =
    Pca.powerIterationPC1(df, "embedding", 4, rounds = 8)
      .orderBy("d").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq

  test("PC1 recovers a planted dominant direction") {
    val out = pc1(line)
    val v = out.map(_._2.toDouble / 1e6)
    val cosWithPlanted = math.abs(v(0) * 0.6 + v(1) * 0.8)
    assert(cosWithPlanted > 0.999, s"v=$v")
    val norm = math.sqrt(v.map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-3, s"unit norm, got $norm")
    // data is essentially 1-dimensional: explained variance ~ 1
    assert(out.head._4 > 990000L, s"evr_micros=${out.head._4}")
  }

  test("result is partitioning-invariant") {
    assert(pc1(line.repartition(7)) === pc1(line))
    assert(pc1(line.coalesce(1)) === pc1(line))
  }

  test("zero-variance corpus keeps the seed direction, lambda 0") {
    val flat = Seq.fill(5)(Array(1.0, 1.0, 1.0, 1.0)).toDF("embedding")
    val out = pc1(flat)
    assert(out.forall(_._3 === 0L), "lambda must be 0")
    assert(out.forall(_._4 === 0L), "evr must be 0")
    // v stays the 1/sqrt(dim) seed = 0.5 per component
    assert(out.forall(_._2 === 500000L))
  }

  test("ABTT correction zeroes the projection on the removed direction") {
    val withId = line.withColumn("id",
      monotonically_increasing_id())
    val model = Pca.fitPC1(line, "embedding", 4, rounds = 8)
    val out = Pca.removeTopComponent(withId, "id", "embedding", model)
    // corrected · v must be ~0 for every row (micros-floored elements:
    // tolerance 4 micros per component accumulated over dim 4)
    val resid = out.select(
        aggregate(zip_with(col("corrected"), lit(model.v),
          (c, vd) => c.cast("double") / 1e6 * vd),
          lit(0.0), (a, x) => a + x).as("r"))
      .collect().map(r => math.abs(r.getDouble(0)))
    assert(resid.max < 1e-4, s"max residual ${resid.max}")
    // and the map-only contract: no exchange in the correction plan
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("binaryNearDups finds a tweaked payload, not an unrelated one") {
    import graft.operators.Multimodal
    val base = "the quick brown fox jumps over the lazy dog " * 8
    val docs = Seq(
      (1L, base),
      (2L, base + "tail-tweak"),         // near-dup of 1
      (3L, "完全に異なるコンテンツです " * 20)) // unrelated
      .toDF("id", "text")
    val pairs = Multimodal.binaryNearDups(
        Multimodal.withBinaryPayload(docs, "text"), "id", "payload",
        w = 7, minJaccard = 0.5, maxShingleFreq = 200)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet === Set((1L, 2L)))
  }

  test("cdcChunkTable: lengths cover the payload; an insertion only " +
      "disturbs chunks near the edit (the shift-resistance CDC " +
      "exists for); dedup stats see the replica") {
    import graft.operators.Multimodal
    // non-periodic content: exactly-periodic text has at most
    // period-many distinct windows, so it legitimately chunks into
    // period-aligned cuts or none at all (kernel doc) — the property
    // under test needs content with full window diversity
    val rnd = new scala.util.Random(7)
    val base = Array.fill(2000)(('a' + rnd.nextInt(26)).toChar).mkString
    val edited = base.substring(0, 900) + "INSERTED!" + base.substring(900)
    val docs = Seq((1L, base), (2L, edited), (3L, base)).toDF("id", "text")
    val ch = Multimodal.cdcChunkTable(
        Multimodal.withBinaryPayload(docs, "text"), "id", "payload")
      .collect()
      .groupBy(_.getLong(0))
      .map { case (id, rows) =>
        id -> rows.sortBy(_.getInt(1)).map(r =>
          (r.getLong(2), r.getLong(3)))
      }
    // chunk lengths tile the payload exactly
    assert(ch(1L).map(_._1).sum === base.getBytes("UTF-8").length.toLong)
    assert(ch(2L).map(_._1).sum === edited.getBytes("UTF-8").length.toLong)
    // identical payloads chunk identically
    assert(ch(1L).toSeq == ch(3L).toSeq)
    // shift resistance: the edit may change the chunk it lands in and
    // its immediate neighbor; every other chunk fingerprint survives
    val fps1 = ch(1L).map(_._2).toSeq
    val fps2 = ch(2L).map(_._2).toSeq
    val shared = fps1.intersect(fps2).size
    assert(fps1.size > 5, s"degenerate chunking: ${fps1.size} chunks")
    assert(shared >= fps1.size - 2,
      s"insertion disturbed ${fps1.size - shared} of ${fps1.size} chunks")
    // corpus savings: doc 3 is a full replica of doc 1 → at least
    // doc 1's bytes minus one kept copy per fp are saved
    val stats = Multimodal.cdcDedupStats(
        Multimodal.withBinaryPayload(docs, "text"), "id", "payload")
      .collect().head
    assert(stats.getAs[Long]("saved_bytes") >=
      base.getBytes("UTF-8").length.toLong)
    assert(stats.getAs[Long]("savings_micros") > 0L)
  }

  test("cdcChunkOverlapPairs: an inserted-byte near-replica pairs at " +
      "high Jaccard, unrelated payloads don't pair, id_a < id_b") {
    import graft.operators.Multimodal
    val rnd = new scala.util.Random(11)
    val base = Array.fill(3000)(('a' + rnd.nextInt(26)).toChar).mkString
    val edited = base.substring(0, 1500) + "XX" + base.substring(1500)
    val other = Array.fill(3000)(('a' + rnd.nextInt(26)).toChar).mkString
    val docs = Seq((1L, base), (2L, edited), (3L, other))
      .toDF("id", "text")
    val pairs = Multimodal.cdcChunkOverlapPairs(
        Multimodal.withBinaryPayload(docs, "text"), "id", "payload",
        minJaccardMicros = 250000L)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(3)))
      .toMap
    assert(pairs.contains((1L, 2L)),
      s"near-replica pair missing: ${pairs.keySet}")
    assert(pairs((1L, 2L)) >= 600000L, s"jac ${pairs((1L, 2L))}")
    assert(!pairs.keySet.exists { case (a, b) => b == 3L || a == 3L },
      "unrelated payload paired")
  }

  test("privacy profile: k-anonymity min, l-diversity, rows at risk") {
    val t = Seq(
      ("a", 1, "x"), ("a", 1, "y"), ("a", 1, "x"),  // group (a,1): n=3, l=2
      ("b", 2, "x"),                                // group (b,2): n=1, l=1
      ("b", 3, "x"), ("b", 3, "x"))                 // group (b,3): n=2, l=1
      .toDF("q1", "q2", "sv")
    val rows = Privacy.profile(t, Seq("q1", "q2"), "sv", k = 2)
      .collect()
      .map(r => ((r.getString(0), r.getInt(1)),
        (r.getAs[Long]("group_n"), r.getAs[Long]("l_div"),
          r.getAs[Long]("below_k"), r.getAs[Long]("k_anonymity"),
          r.getAs[Long]("rows_at_risk"))))
      .toMap
    assert(rows(("a", 1)) === ((3L, 2L, 0L, 1L, 1L)))
    assert(rows(("b", 2)) === ((1L, 1L, 1L, 1L, 1L)))
    assert(rows(("b", 3)) === ((2L, 1L, 0L, 1L, 1L)))
  }

  test("quantileNormalize is rank-preserving and maps a shifted source " +
      "onto the global scale") {
    import graft.operators.Stats
    // source a: values 0..99; source b: same shape shifted +1000 —
    // after normalization both land on the GLOBAL value scale
    val rows = (0 until 100).map(i => (i.toLong, "a", i.toLong)) ++
      (0 until 100).map(i => (100L + i, "b", 1000L + i))
    val df = rows.toDF("id", "src", "x")
    val out = Stats.quantileNormalize(df, "src", col("x"),
        Seq("id", "src", "x"))
      .collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    // within each source, norm_x is non-decreasing in x
    for (s <- Seq("a", "b")) {
      val bySrc = out.filter(_._1 == s).sortBy(_._2)
      assert(bySrc.sliding(2).forall(p => p(0)._4 <= p(1)._4),
        s"monotone in $s")
    }
    // equal local percentiles -> equal global values across sources:
    // the two sources share the same internal shape, so sorting each
    // by x aligns equal percentiles position-by-position
    val aSorted = out.filter(_._1 == "a").sortBy(_._2)
    val bSorted = out.filter(_._1 == "b").sortBy(_._2)
    assert(aSorted.map(_._3).sameElements(bSorted.map(_._3)),
      "identical shapes must get identical local percentiles")
    assert(aSorted.map(_._4).sameElements(bSorted.map(_._4)),
      "calibrated sources must agree on the global value scale")
    // the fact is never sorted: no global Sort node in the plan
    val plan = Stats.quantileNormalize(df, "src", col("x"),
      Seq("id", "src", "x")).queryExecution.executedPlan.toString
    assert(!plan.contains("SortExec"), plan)
  }

  test("HyperANF: N(0)=|V|, monotone growth, saturation at diameter") {
    import graft.operators.HyperAnf
    // path 1-2-3-4-5 (diameter 4): N grows each round until t=4,
    // then is exactly stationary (register state is a fixpoint)
    val fwd = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val und = fwd.unionByName(
      fwd.select(col("dst").as("src"), col("src").as("dst")))
    val nf = HyperAnf.neighborhoodFunction(und, rounds = 5)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(nf(0) === 5L, "singleton balls estimate exactly 1 each")
    assert((0 to 3).forall(t => nf(t) < nf(t + 1)), s"monotone: $nf")
    assert(nf(5) === nf(4), s"stationary past the diameter: $nf")
  }

  test("HyperBall harmonic centrality: integer round weights; a " +
      "directed chain's source scores exactly 0 and deeper nodes " +
      "score higher; partitioning-invariant") {
    import graft.operators.HyperAnf
    assert(HyperAnf.harmonicWeights(3) == Seq(6L, 3L, 2L))
    assert(HyperAnf.harmonicWeights(4) == Seq(12L, 6L, 4L, 3L))
    // directed chain 0→1→…→5: hc counts INCOMING reach, so the
    // source (reached by nobody) is exactly 0 — its registers never
    // change, an exact statement independent of HLL estimation
    val chain = (0L until 5L).map(i => (i, i + 1)).toDF("src", "dst")
    val hc = HyperAnf.harmonicCentrality(chain, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hc(0L) === 0L, s"source must be 0: $hc")
    assert((1L to 5L).forall(hc(_) > 0L), s"non-sources positive: $hc")
    // node 5 sees 3 nodes inside radius 3 (2,3,4); node 1 sees only 0
    assert(hc(5L) > hc(1L), s"deeper chain node more central: $hc")
    val hc2 = HyperAnf.harmonicCentrality(chain.repartition(7), rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hc === hc2, "partitioning-invariant")
  }

  test("modularity: two disjoint triangles score exactly 0.5 under " +
      "the true split, 0 under one-big-community, negative under a " +
      "crossing split") {
    import graft.operators.LabelPropagation
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L),
      (10L, 11L), (11L, 12L), (12L, 10L)).toDF("src", "dst")
    def asg(f: Long => Long) =
      Seq(1L, 2L, 3L, 10L, 11L, 12L).map(n => (n, f(n)))
        .toDF("node", "community")
    // true split: m=6, each community m_c=3, D_c=6:
    // Q = 2*(3/6 - (6/12)^2) = 0.5
    val good = LabelPropagation.modularity(edges, "src", "dst",
      asg(n => if (n < 10) 0L else 1L)).collect()
    assert(good.forall(_.getLong(4) == 500000L), good.mkString(","))
    // one community: Q = 6/6 - 1 = 0
    val one = LabelPropagation.modularity(edges, "src", "dst",
      asg(_ => 7L)).collect()
    assert(one.forall(_.getLong(4) == 0L))
    // crossing split (odd/even) cuts edges inside both triangles:
    // worse than random -> strictly negative q_ppm
    val bad = LabelPropagation.modularity(edges, "src", "dst",
      asg(_ % 2)).collect()
    assert(bad.forall(_.getLong(4) < 0L), bad.mkString(","))
  }

  test("frequentPairs: a-priori prune, exact support and lift") {
    import graft.operators.FrequentItemsets
    // 6 baskets: {1,2} together in 4; item 3 in 4 baskets but never
    // with 1; item 9 appears once (pruned before the pair join)
    val rows = Seq(
      (10L, 1L), (10L, 2L), (11L, 1L), (11L, 2L),
      (12L, 1L), (12L, 2L), (13L, 1L), (13L, 2L),
      (14L, 3L), (15L, 3L), (10L, 3L), (11L, 3L),
      (14L, 9L))
    val df = rows.toDF("b", "i")
    val out = FrequentItemsets.frequentPairs(df, "b", "i", minSupport = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    // (1,2): support 4 of 6 baskets; supp_1=supp_2=4
    // lift = 4*6*1e6 / 16 = 1_500_000
    assert(out((1L, 2L)) === ((4L, 1500000L)))
    // (2,3): co-occur in baskets 10,11 -> support 2; lift 2*6e6/16
    assert(out((2L, 3L)) === ((2L, 750000L)))
    assert(!out.keySet.exists(p => p._1 == 9L || p._2 == 9L), "pruned")
  }

  test("late-data window registers planted out-of-order arrivals") {
    // arrival order (event_id) 1..4; event-times: 100, 400, 160, 430
    // -> event 3 arrives 240 s behind the high-water mark
    val ev = Seq((1L, 1L, 100L), (1L, 2L, 400L), (1L, 3L, 160L),
        (1L, 4L, 430L))
      .toDF("user_id", "event_id", "sec")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("event_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val late = ev.withColumn("late_sec",
        greatest(coalesce(max("sec").over(w) - col("sec"), lit(0L)), lit(0L)))
      .select("event_id", "late_sec").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(late === Map(1L -> 0L, 2L -> 0L, 3L -> 240L, 4L -> 0L))
  }

  test("WavPcmStats: hand-computed samples, chunk skip with RIFF pad, " +
      "declared-size truncation, and the null totality contract") {
    import graft.expressions.WavPcmStats
    def hx(s: String) = s.replaceAll("\\s", "")
    // RIFF/WAVE with a 3-byte 'junk' chunk (pad to 4) BEFORE data;
    // data = 4 samples: 1, -1 (FFFF), 32767 (FF7F), -32768 (0080)
    val wav = hx("""52494646 24000000 57415645
                    6A756E6B 03000000 AABBCC 00
                    64617461 08000000 0100 FFFF FF7F 0080""")
    val df = Seq(Tuple1(wav)).toDF("hx")
      .select(WavPcmStats.of(unhex(col("hx"))).as("st"))
    val r = df.select("st.n_samples", "st.sum_sq", "st.peak_abs",
      "st.n_clip").collect().head
    assert(r.getLong(0) === 4L)
    assert(r.getLong(1) === 1L + 1L + 32767L * 32767 + 32768L * 32768)
    assert(r.getLong(2) === 32768L)
    assert(r.getLong(3) === 2L)
    // declared data size smaller than trailing bytes: only the
    // declared window folds (2 bytes -> 1 sample of value 2)
    val short = hx("""52494646 10000000 57415645
                      64617461 02000000 0200 7F7F 7F7F""")
    val r2 = Seq(Tuple1(short)).toDF("hx")
      .select(WavPcmStats.of(unhex(col("hx"))).as("st"))
      .select("st.n_samples", "st.sum_sq").collect().head
    assert(r2.getLong(0) === 1L && r2.getLong(1) === 4L)
    // totality: non-RIFF payloads and data-less RIFFs are NULL
    val nulls = Seq("00112233445566778899AABBCC",
        hx("52494646 04000000 57415645"))
      .toDF("hx").select(WavPcmStats.of(unhex(col("hx"))).as("st"))
      .filter(col("st").isNotNull).count()
    assert(nulls === 0L)
  }
}
