package graft

import org.apache.spark.sql.functions._

import graft.operators.{Decontaminate, Sampling, SnapshotDiff, Stats}

/** Round-7 curation operators: snapshot diff, winsorize,
  * contamination score, token-budget mixture.
  */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  test("bigramLogProb separates coherent from shuffled text with " +
      "IDENTICAL unigram distributions; integer sums are " +
      "partitioning-invariant") {
    import graft.operators.TfIdf
    // both docs use each of (a b c d) exactly 8 times — the unigram
    // LM scores them identically BY CONSTRUCTION; only bigram
    // structure differs (0 repeats the phrase, 1 is a fixed shuffle)
    val coherent = Seq.fill(8)("a b c d").mkString(" ")
    val shuffled = ("d b a c " + "c a d b " + "b d c a " + "a c b d " +
      "d a b c " + "c b d a " + "b a d c " + "d c a b").trim
    val docs = Seq((0L, coherent), (1L, shuffled)).toDF("doc_id", "text")
    val uni = TfIdf.unigramLogProb(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(uni(0L) == uni(1L), "unigram must NOT separate these")
    val bi = TfIdf.bigramLogProb(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(bi(0L) > bi(1L),
      s"bigram must rank coherent above shuffled: $bi")
    // partitioning invariance of the exact-integer path
    val a = TfIdf.bigramLogProb(docs, "doc_id", "text")
      .select("id", "n_scored", "avg_logprob").collect().toSet
    val b = TfIdf.bigramLogProb(docs.repartition(7), "doc_id", "text")
      .select("id", "n_scored", "avg_logprob").collect().toSet
    assert(a == b)
  }

  test("bigramLogProb: first tokens unscored, 1-token docs drop, " +
      "counts exact on a hand-checked corpus") {
    import graft.operators.TfIdf
    val docs = Seq((0L, "x y x y"), (1L, "x"), (2L, "y x"))
      .toDF("doc_id", "text")
    val got = TfIdf.bigramLogProb(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 0: bigrams (x,y)(y,x)(x,y) -> 3 scored; doc 1 drops;
    // doc 2: (y,x) -> 1
    assert(got == Map(0L -> 3L, 2L -> 1L))
  }

  test("SnapshotDiff: added/removed/changed classified; unchanged and " +
      "null==null dropped; null vs value is changed") {
    val old = Seq(
      (1L, Option("a"), Option(10.0)), // unchanged
      (2L, Option("b"), Option(20.0)), // removed
      (3L, Option("c"), Option(30.0)), // changed value
      (4L, None, Option(40.0)), // null -> value = changed
      (5L, None, None) // null == null, unchanged
    ).toDF("k", "s", "v")
    val nu = Seq(
      (1L, Option("a"), Option(10.0)),
      (3L, Option("c"), Option(31.0)),
      (4L, Option("x"), Option(40.0)),
      (5L, None, Option.empty[Double]),
      (6L, Option("new"), Option(60.0)) // added
    ).toDF("k", "s", "v")
    val got = SnapshotDiff.diff(old, nu, Seq("k"), Seq("s", "v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(2L -> "removed", 3L -> "changed", 4L -> "changed",
      6L -> "added"), got)
  }

  test("sentenceChunks: hand-computed packing, sentences never split, " +
      "over-budget sentence skips chunk ids") {
    import graft.operators.TextOps
    val docs = Seq(
      (1L, "One two three. Four five. Six seven eight nine. Ten."),
      (2L, "a b c d e f. g.")).toDF("doc_id", "text")
    val got = TextOps.sentenceChunks(docs, "doc_id", "text", 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    // doc 1: sentence tokens 3,2,4,1; prefix 0,3,5,9 -> chunks 0,0,1,2
    assert(got((1L, 0L)) === ((2L, 5L)))
    assert(got((1L, 1L)) === ((1L, 4L)))
    assert(got((1L, 2L)) === ((1L, 1L)))
    // doc 2 at budget 4: 6-token sentence fills chunk 0 past budget;
    // next sentence starts at prefix 6 -> chunk 1 (6 div 4)
    assert(got((2L, 0L)) === ((1L, 6L)))
    assert(got((2L, 1L)) === ((1L, 1L)))
    // over-budget skip: budget 3 puts the 2nd sentence at 6 div 3 = 2,
    // skipping chunk id 1 entirely (floor-quotient contract)
    val skip = TextOps.sentenceChunks(docs.filter(col("doc_id") === 2),
        "doc_id", "text", 3)
      .collect().map(_.getLong(1)).sorted.toSeq
    assert(skip == Seq(0L, 2L), skip)
    // token conservation: chunk token sums equal the doc token count
    val total = TextOps.sentenceChunks(docs, "doc_id", "text", 4)
      .groupBy("id").agg(sum("n_tokens").as("t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(total == Map(1L -> 10L, 2L -> 7L), total)
  }

  test("Kaplan-Meier: hand-computed curve with censoring; survival " +
      "only drops at churn events; censored users never count as churn") {
    import graft.operators.Survival
    def day(d: Long) = d * 86400L
    // u1/u2: dur 1, long quiet before the cutoff -> churn events
    // u3: dur 96, still active within the 7-day gap -> censored
    // u4: dur 50, last activity IS the observation end -> censored
    val rows = Seq(
      ("u1", day(0)), ("u1", day(1)),
      ("u2", day(0)), ("u2", day(1)),
      ("u3", day(0)), ("u3", day(96)),
      ("u4", day(50)), ("u4", day(100))).toDF("user_id", "sec")
    val km = Survival.kaplanMeier(rows, "user_id", col("sec"), 7)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // d=1: 4 at risk, 2 churn -> S = (4-2)/4 = 0.5
    assert(km(1L) === ((4L, 2L, 0L, 0.5)))
    // d=50, d=96: no events, curve flat at 0.5, censored counted
    assert(km(50L) === ((2L, 0L, 1L, 0.5)))
    assert(km(96L) === ((1L, 0L, 1L, 0.5)))
    // monotone non-increasing from 1
    val curve = km.toSeq.sortBy(_._1).map(_._2._4)
    assert(curve.head <= 1.0 + 1e-9)
    curve.sliding(2).foreach { case Seq(a, b) => assert(b <= a + 1e-9) }
  }

  test("trend family: OLS slope matches hand computation; Theil-Sen " +
      "shrugs off the outlier that drags OLS") {
    import graft.operators.Stats
    // exact line y = 3t + 5 over t = 0..4 → slope 3, both estimators
    val line = (0L to 4L).map(t => ("a", t, 3 * t + 5)).toDF("g", "t", "y")
    val ols = Stats.groupedOlsSlope(line, "g", col("t"), col("y"))
      .collect().head
    assert(ols.getAs[Double]("slope") === 3.0)
    val ts = Stats.theilSenSlope(line.select(col("t"), col("y")),
      col("t"), col("y")).collect().head
    assert(ts.getAs[Long]("slope_micros") === 3000000L)
    assert(ts.getAs[Long]("n_pairs") === 10L)
    // same line with one wrecked point (t=4 → 1000): OLS slope jumps
    // far from 3; the pairwise-median slope stays exactly 3
    val wrecked = (Seq(("a", 0L, 5L), ("a", 1L, 8L), ("a", 2L, 11L),
      ("a", 3L, 14L), ("a", 4L, 1000L))).toDF("g", "t", "y")
    val olsW = Stats.groupedOlsSlope(wrecked, "g", col("t"), col("y"))
      .collect().head.getAs[Double]("slope")
    assert(olsW > 100.0, s"outlier must drag OLS, got $olsW")
    val tsW = Stats.theilSenSlope(wrecked.select(col("t"), col("y")),
      col("t"), col("y")).collect().head
    assert(tsW.getAs[Long]("slope_micros") === 3000000L,
      s"Theil-Sen moved: ${tsW.getAs[Long]("slope_micros")}")
    // negative-slope floor division: y = -3t → median pair slope -3
    val neg = (0L to 4L).map(t => (t, -3 * t)).toDF("t", "y")
    val tsN = Stats.theilSenSlope(neg, col("t"), col("y")).collect().head
    assert(tsN.getAs[Long]("slope_micros") === -3000000L)
  }

  test("groupTwap: hand-computed hold-weighted mean differs from the " +
      "raw mean exactly where sampling density correlates with value; " +
      "single-observation group NULL") {
    import graft.operators.Stats
    // value 100 holds 1s..9s (8s), then burst of 0s each holding 1s:
    // raw mean = (100+0+0)/3 = 33.3; TWAP = (100·8 + 0·1)/9 — the
    // burst can't drag it. (Last obs at 10 carries no weight.)
    val ev = Seq(
      ("a", 1L, 1L, 100L), ("a", 2L, 9L, 0L), ("a", 3L, 10L, 0L),
      ("b", 4L, 5L, 700L)) // single-interval... b has ONE obs → NULL
      .toDF("k", "id", "sec", "cents")
    val got = Stats.groupTwap(ev, "k", "id", col("sec"), col("cents"))
      .orderBy("k").collect()
    assert(got(0).getLong(1) == 3 && got(0).getLong(2) == 9)
    assert(got(0).getLong(3) == (100L * 8) / 9, got(0).getLong(3)) // 88
    assert(got(1).getLong(2) == 0 && got(1).isNullAt(3),
      "zero-span group must be NULL")
    // negative values floor toward −∞: v=−100 held 3 of 4s → −75;
    // Σ = −100·3 = −300, span 4 → floor(−300/4) = −75
    val neg = Seq(("c", 1L, 0L, -100L), ("c", 2L, 3L, 8L),
      ("c", 3L, 4L, 0L)).toDF("k", "id", "sec", "cents")
    val n = Stats.groupTwap(neg, "k", "id", col("sec"), col("cents"))
      .collect().head
    // Σ = −100·3 + 8·1 = −292; floor(−292/4) = −73
    assert(n.getLong(3) == -73L, n.getLong(3))
  }

  test("fellegiSunter: per-field milli-weights sum exactly; " +
      "thresholds cut link/possible/nonlink by hand") {
    import graft.operators.RecordLinkage
    val pairs = Seq(
      (1L, 2L, true, true, true), // 3000+1200+500 = 4700 → link
      (1L, 3L, false, true, true), // -1000+1200+500 = 700 → nonlink
      (1L, 4L, true, false, true), // 3000-800+500 = 2700 → possible
      (1L, 5L, false, false, false)) // -2200 → nonlink
      .toDF("key_a", "key_b", "f1", "f2", "f3")
    val got = RecordLinkage.fellegiSunter(pairs,
        Seq((col("f1"), 3000L, -1000L), (col("f2"), 1200L, -800L),
          (col("f3"), 500L, -400L)),
        linkAt = 3500L, possibleAt = 1500L)
      .orderBy("key_b").collect()
      .map(r => (r.getLong(1), r.getAs[Long]("score_milli"),
        r.getAs[String]("decision")))
    assert(got.toSeq == Seq((2L, 4700L, "link"), (3L, 700L, "nonlink"),
      (4L, 2700L, "possible"), (5L, -2200L, "nonlink")), got.toSeq)
  }

  test("RankStability.rbo: identical rankings sum the exact floored " +
      "geometric series (651320 at k=10); disjoint top-k's give 0; " +
      "head agreement outweighs tail agreement") {
    import graft.operators.RankStability
    // 20 items, identical scorers → X_d = d at every depth →
    // term_d = floor(9^{d−1}·10⁶/10^d); Σ(d=1..10) = 651320
    // (the float series 1 − 0.9¹⁰ = 0.6513…, per-term floors −2)
    val ids = (1L to 20L).map(i => (i, 100L - i, 100L - i))
    val same = RankStability.rbo(ids.toDF("id", "a", "b"),
        col("id"), col("a"), col("b"), 10)
      .orderBy("d").collect()
    assert(same.last.getLong(3) == 651320L, same.last.getLong(3))
    assert(same.map(_.getLong(1)).toSeq == (1L to 10L).toSeq) // X_d = d
    // disjoint top-10s (b reverses): RBO = 0
    val rev = (1L to 40L).map(i => (i, 100L - i, i))
    val r = RankStability.rbo(rev.toDF("id", "a", "b"),
        col("id"), col("a"), col("b"), 10)
      .orderBy("d").collect()
    assert(r.last.getLong(3) == 0L)
    // top-weighting: agreeing on head item #1 only vs agreeing on
    // tail item #10 only — head agreement must score higher
    def rboOf(bScore: Long => Long): Long = {
      val rows = (1L to 20L).map(i => (i, 100L - i, bScore(i)))
      RankStability.rbo(rows.toDF("id", "a", "b"),
          col("id"), col("a"), col("b"), 10)
        .orderBy("d").collect().last.getLong(3)
    }
    // b agrees only on id 1 at rank 1 (rest pushed past k)
    val headOnly = rboOf(i => if (i == 1L) 1000L else 100L + i)
    // b agrees only on id 10, placing it at rank 1 (A has it at 10)
    val tailOnly = rboOf(i => if (i == 10L) 1000L else 100L + i)
    assert(headOnly > tailOnly,
      s"head-only $headOnly should beat tail-only $tailOnly")
  }

  test("RankStability.compare: perfect agreement tau=1, full reversal " +
      "tau=-1, tie correction and top-k overlap by hand") {
    import graft.operators.RankStability
    val ab = Seq((1L, 40L, 40L), (2L, 30L, 30L), (3L, 20L, 20L),
      (4L, 10L, 10L)).toDF("id", "a", "b")
    val same = RankStability.compare(ab, col("id"), col("a"), col("b"), 10)
      .collect().head
    assert(same.getAs[Double]("tau_b") === 1.0)
    assert(same.getAs[Long]("topk_jaccard_micros") === 1000000L)
    val rev = Seq((1L, 40L, 10L), (2L, 30L, 20L), (3L, 20L, 30L),
      (4L, 10L, 40L)).toDF("id", "a", "b")
    val r = RankStability.compare(rev, col("id"), col("a"), col("b"), 10)
      .collect().head
    assert(r.getAs[Double]("tau_b") === -1.0)
    // ties: a = (2,2,1), b = (3,2,1). pairs: (1,2) tied in a,
    // concordant pairs (1,3),(2,3) → C=2, D=0, ties_a=1, ties_b=0
    // tau_b = 2 / sqrt((3-1)*(3-0)) = 2/sqrt(6) ≈ 0.816497
    val tied = Seq((1L, 2L, 3L), (2L, 2L, 2L), (3L, 1L, 1L))
      .toDF("id", "a", "b")
    val t = RankStability.compare(tied, col("id"), col("a"), col("b"), 10)
      .collect().head
    assert(t.getAs[Long]("concordant") === 2L)
    assert(t.getAs[Long]("discordant") === 0L)
    assert(t.getAs[Long]("ties_a") === 1L)
    assert(t.getAs[Double]("tau_b") === 0.816497)
    // top-k disagreement: k=2, A picks {1,2}, B picks {3,4} → 0 overlap
    val disj = Seq((1L, 40L, 1L), (2L, 30L, 2L), (3L, 20L, 30L),
      (4L, 10L, 40L)).toDF("id", "a", "b")
    val d2 = RankStability.compare(disj, col("id"), col("a"), col("b"), 2)
      .collect().head
    assert(d2.getAs[Long]("topk_jaccard_micros") === 0L)
    // fully-tied side: zero denominator reports tau = 0, not NaN
    val flat = Seq((1L, 5L, 3L), (2L, 5L, 2L), (3L, 5L, 1L))
      .toDF("id", "a", "b")
    val f = RankStability.compare(flat, col("id"), col("a"), col("b"), 10)
      .collect().head
    assert(f.getAs[Double]("tau_b") === 0.0)
  }

  test("LabelNoise.confusionAudit: thresholds, abstention, tie-break, " +
      "and the flagged cell match hand computation") {
    import graft.operators.LabelNoise
    // class-0 labeled rows: p0 = 800k, 600k → t0 = 700k
    // class-1 labeled rows: p1 = 900k, 500k → t1 = 700k
    // rows (y, p0, p1):
    //  a (0, 800k, 100k): only p0 ≥ t0 → suggested 0 (diagonal)
    //  b (0, 600k, 100k): clears nothing → abstains
    //  c (1, 900k, 900k): both clear → tie on p → smaller class id 0
    //    → FLAGGED (1, 0)
    //  d (1, 100k, 500k): clears nothing → abstains
    val df = Seq(
      (0, 800000L, 100000L), (0, 600000L, 100000L),
      (1, 900000L, 900000L), (1, 100000L, 500000L))
      .toDF("y", "p0", "p1")
    val got = LabelNoise.confusionAudit(df, col("y"),
        Seq(col("p0"), col("p1")))
      .collect()
      .map(r => (r.getAs[Int]("given"), r.getAs[Int]("suggested")) ->
        r.getAs[Long]("n")).toMap
    assert(got == Map((0, 0) -> 1L, (1, 0) -> 1L), got)
    // a class with NO labeled examples is never suggested (null
    // threshold), and doesn't crash the audit
    val df2 = Seq((0, 100000L, 999999L), (0, 200000L, 999999L))
      .toDF("y", "p0", "p1")
    val got2 = LabelNoise.confusionAudit(df2, col("y"),
        Seq(col("p0"), col("p1")))
      .collect()
      .map(r => (r.getAs[Int]("given"), r.getAs[Int]("suggested")) ->
        r.getAs[Long]("n")).toMap
    // t0 = 150k; row 2 clears it → (0,0); class 1 ineligible despite
    // its huge probability
    assert(got2 == Map((0, 0) -> 1L), got2)
  }

  test("isotonicCalibrate: matches sequential PAV on a violation-" +
      "planted fixture, is monotone, and pools to the exact mean on " +
      "pure noise") {
    import graft.operators.Stats
    // bins 0..4 (x = bin*10+1, width 10): raw props 0.2, 0.8, 0.6,
    // 0.4, 1.0 — bins 1..3 violate and must pool to (4+3+2)/15 = 0.6
    def mk(bin: Int, ones: Int, zeros: Int) =
      Seq.fill(ones)((bin * 10 + 1.0, 1)) ++
        Seq.fill(zeros)((bin * 10 + 1.0, 0))
    val rows = mk(0, 1, 4) ++ mk(1, 4, 1) ++ mk(2, 3, 2) ++
      mk(3, 2, 3) ++ mk(4, 5, 0)
    val df = rows.toDF("x", "y")
    val got = Stats.isotonicCalibrate(df, col("x"), col("y"),
        lo = 0.0, hi = 50.0, nBins = 5)
      .orderBy("bin").collect()
      .map(r => r.getAs[Long]("bin") -> r.getAs[Long]("p_cal_micros"))
    // sequential pool-adjacent-violators on the same 5 bins
    assert(got.toSeq == Seq(0L -> 200000L, 1L -> 600000L, 2L -> 600000L,
      3L -> 600000L, 4L -> 1000000L), got.mkString(", "))
    // catalog-scale input: monotone non-decreasing by construction
    val cal = Stats.isotonicCalibrate(
        Tables.documents(spark, Sf0001),
        least(length(col("text")), lit(999)).cast("double"),
        (col("doc_id") % 10 <
          least(lit(9), expr("length(text) div 120"))).cast("int"),
        lo = 0.0, hi = 1000.0, nBins = 50)
      .orderBy("bin").collect()
      .map(r => r.getAs[Long]("p_cal_micros"))
    assert(cal.length > 1)
    cal.sliding(2).foreach { case Array(a, b) =>
      assert(a <= b, s"monotonicity violated: $a > $b")
    }
    // label independent of score → one global pool at the exact mean
    val noise = (0 until 200).map(i => (i.toDouble, i % 2)).toDF("x", "y")
    val pooled = Stats.isotonicCalibrate(noise, col("x"), col("y"),
        0.0, 200.0, 10)
      .select("p_cal_micros").distinct().collect().map(_.getLong(0))
    assert(pooled.toSeq == Seq(500000L), pooled.mkString(", "))
  }

  test("winsorize: every row survives, output clamped to the group's " +
      "selection quantiles, invariant under repartitioning") {
    val ev = Tables.events(spark, Sf0001)
    val out = Stats.winsorize(ev, "event_type", floor(col("value") * 100),
      0.05, 0.95, Seq("event_id", "event_type"))
    assert(out.count() == ev.count())
    // bounds per group really are the ⌈p·n⌉ order statistics
    val qs = Stats.groupedQuantilesDisc(
      ev.withColumn("xl", floor(col("value") * 100).cast("long")),
      "event_type", "xl", Seq(0.05, 0.95))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val extremes = out.groupBy("event_type")
      .agg(min("xl_w").as("mn"), max("xl_w").as("mx"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(extremes == qs, s"$extremes vs $qs")
    val re = Stats.winsorize(ev.repartition(13), "event_type",
      floor(col("value") * 100), 0.05, 0.95, Seq("event_id", "event_type"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val a = out.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(re == a)
  }

  test("contaminationScore: contained doc scores 1.0, disjoint 0.0, " +
      "short doc present with 0.0") {
    val evals = Seq((1L, "alpha beta gamma delta epsilon zeta"))
      .toDF("id", "text")
    val docs = Seq(
      (10L, "alpha beta gamma delta"), // its single 4-gram ⊂ eval
      (11L, "one two three four five"), // disjoint
      (12L, "too short") // < w tokens: zero grams
    ).toDF("id", "text")
    val got = Decontaminate.contaminationScore(
      docs, "id", "text", evals, "text", w = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(got == Map(10L -> 1.0, 11L -> 0.0, 12L -> 0.0), got)
  }

  test("PageRank: pure cycle is an exact fixed point at 10^6 micros; " +
      "hubs beat the teleport floor; sources sit exactly on it; " +
      "deterministic under repartitioning") {
    import graft.operators.PageRank
    // 3-cycle: contrib = 1e6*85 div 100 = 850000, +150000 teleport
    // → every round reproduces exactly 10^6 (integer fixed point)
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("s", "t")
    val c = PageRank.ranks(cycle, "s", "t", iters = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(c == Map(1L -> 1000000L, 2L -> 1000000L, 3L -> 1000000L), c)
    // star: 10 sources → one hub; hub has no out-edges (dangling)
    val star = (1L to 10L).map(i => (i, 99L)).toDF("s", "t")
    val s = PageRank.ranks(star, "s", "t", iters = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (1L to 10L).foreach(i => assert(s(i) == PageRank.TeleportMicros, s"$i"))
    assert(s(99L) > PageRank.TeleportMicros * 5)
    // partitioning invariance on a denser deterministic graph
    val g = (0 until 400).map(i => ((i % 37).toLong, ((i * 7) % 23).toLong))
      .toDF("s", "t")
    val a = PageRank.ranks(g, "s", "t", iters = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = PageRank.ranks(g.repartition(13), "s", "t", iters = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
    // mass bounds: teleport floor ≤ every rank; total ≤ N·10^6
    assert(a.values.forall(_ >= PageRank.TeleportMicros))
    assert(a.values.sum <= a.size * 1000000L)
  }

  test("PageRank warm-start: planted-delta warm run lands on the cold " +
      "fixed-point plateau (<= 2 micros/node), in fewer rounds, and " +
      "both results are verified fixed points") {
    import graft.operators.PageRank
    // deterministic dense-ish base graph (same generator family as the
    // invariance test) — converges to an exact integer fixed point
    val base = (0 until 400).map(i => ((i % 37).toLong, ((i * 7) % 23).toLong))
      .toDF("s", "t")
    val (r0, rounds0) = PageRank.ranksConverged(base, "s", "t")
    assert(rounds0 < 50, s"base graph failed to converge in $rounds0")
    // planted delta: a handful of new edges, incl. one brand-new node
    val delta = Seq((500L, 3L), (3L, 500L), (17L, 4L), (22L, 9L))
      .toDF("s", "t")
    val updated = base.unionByName(delta)
    val (cold, coldRounds) = PageRank.ranksConverged(updated, "s", "t")
    val (warm, warmRounds) =
      PageRank.ranksConverged(updated, "s", "t", init = Some(r0))
    val cm = cold.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val wm = warm.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // floor shedding makes the fixed-point set a micro-plateau, not a
    // single point (operator doc): same node set, every rank within
    // 2 micros (relative ~1e-6), authority ORDER identical
    assert(cm.keySet == wm.keySet)
    cm.foreach { case (n, r) =>
      assert(math.abs(r - wm(n)) <= 2L, s"node $n: cold=$r warm=${wm(n)}")
    }
    val coldOrder = cm.toSeq.sortBy { case (n, r) => (-r, n) }.map(_._1)
    val warmOrder = wm.toSeq.sortBy { case (n, r) => (-r, n) }.map(_._1)
    assert(coldOrder == warmOrder, "authority ordering diverged")
    assert(wm.contains(500L)) // the new node entered the ranking
    assert(warmRounds < coldRounds,
      s"warm start saved no rounds: warm=$warmRounds cold=$coldRounds")
    // each result is a true fixed point: restarting FROM it converges
    // in one (no-change) round and reproduces it bit-for-bit
    val (coldAgainDf, coldAgain) = PageRank.ranksConverged(updated, "s", "t",
      init = Some(cold))
    assert(coldAgain == 1, s"cold re-run took $coldAgain rounds")
    assert(coldAgainDf.collect().map(r => r.getLong(0) -> r.getLong(1))
      .toMap == cm)
    val (warmAgainDf, warmAgain) = PageRank.ranksConverged(updated, "s", "t",
      init = Some(warm))
    assert(warmAgain == 1, s"warm re-run took $warmAgain rounds")
    assert(warmAgainDf.collect().map(r => r.getLong(0) -> r.getLong(1))
      .toMap == wm)
  }

  test("PageRank warm-start under DELETIONS: values land on the cold " +
      "plateau and deleted nodes drop out, BUT the run can burn " +
      "maxIters without certifying an integer fixed point (floor " +
      "dynamics approaching from ABOVE can micro-cycle) — the " +
      "documented deletion caveat: cold-restart after takedowns") {
    import graft.operators.PageRank
    val base = (0 until 400).map(i => ((i % 37).toLong, ((i * 7) % 23).toLong))
      .toDF("s", "t")
    val (r0, _) = PageRank.ranksConverged(base, "s", "t")
    // takedown: every edge touching nodes 0 or 5 disappears (node
    // deletion), plus one plain edge removal
    val survivors = base.filter($"s" =!= 0L && $"t" =!= 0L &&
      $"s" =!= 5L && $"t" =!= 5L &&
      !($"s" === 1L && $"t" === 7L))
    val (cold, coldRounds) = PageRank.ranksConverged(survivors, "s", "t")
    val (warm, warmRounds) =
      PageRank.ranksConverged(survivors, "s", "t", init = Some(r0))
    val cm = cold.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val wm = warm.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cm.keySet == wm.keySet)
    assert(!wm.contains(0L) && !wm.contains(5L),
      "deleted nodes must drop out of the warm ranking")
    // the plateau is WIDER under deletions than additions (≤2): the
    // warm run approaches the shrunken fixpoint FROM ABOVE and floor
    // division sheds sub-micro mass asymmetrically per direction —
    // measured 22 micros max on this fixture (relative ~1e-5).
    // Bound: 32 micros absolute AND 1e-4 relative per node.
    cm.foreach { case (n, r) =>
      val d = math.abs(r - wm(n))
      assert(d <= 32L && d * 10000L <= r,
        s"node $n: cold=$r warm=${wm(n)}")
    }
    val coldOrder = cm.toSeq.sortBy { case (n, r) => (-r, n) }.map(_._1)
    val warmOrder = wm.toSeq.sortBy { case (n, r) => (-r, n) }.map(_._1)
    assert(coldOrder == warmOrder, "authority ordering diverged")
    // THE CAVEAT this test exists to pin: approaching the shrunken
    // fixpoint from above, the integer iteration can shed one micro
    // per round (or 2-cycle) and never trigger the no-change stop —
    // measured: warm burned all 50 rounds where cold converged in
    // 17. Consumers get plateau-equivalent VALUES either way, but
    // the round-savings argument for warm starts inverts, so the
    // house path after a takedown is the cold restart (same stance
    // as KCore.peelWarm's deletion caveat; CC.afterDeletions is the
    // operator that actually maintains under deletions).
    assert(warmRounds >= coldRounds,
      s"fixture no longer demonstrates the caveat: warm=$warmRounds " +
        s"cold=$coldRounds — update the doc if the dynamics changed")
    // cold IS a certified fixed point of the surviving graph
    val (againDf, again) = PageRank.ranksConverged(survivors, "s", "t",
      init = Some(cold))
    assert(again == 1 && againDf.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap == cm)
  }

  test("personalized PageRank: mass localizes to the seed side; " +
      "unreachable nodes stay at exactly 0; fully-seeded == global") {
    import graft.operators.PageRank
    // two disjoint 3-cycles; seeds only in the first
    val g = Seq((1L, 2L), (2L, 3L), (3L, 1L),
      (11L, 12L), (12L, 13L), (13L, 11L)).toDF("s", "t")
    val seeds = Seq(1L).toDF("node")
    val r = PageRank.personalizedRanks(g, "s", "t", seeds, iters = 10)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(11L) == 0L && r(12L) == 0L && r(13L) == 0L, r)
    assert(r(1L) > 0L && r(2L) > 0L && r(3L) > 0L, r)
    // the seed always holds at least its own teleport mass
    assert(r(1L) >= PageRank.TeleportMicros, r)
    // seeding EVERY node reproduces global PageRank exactly
    val all = Seq(1L, 2L, 3L, 11L, 12L, 13L).toDF("node")
    val glob = PageRank.ranks(g, "s", "t", iters = 10)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val pers = PageRank.personalizedRanks(g, "s", "t", all, iters = 10)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(glob == pers)
  }

  test("equiDepthBins: octiles hold ~n/8 each under skew, bins are " +
      "monotone in the value, boundary ties go left") {
    // heavily skewed group: half the mass at one value
    val rows = (0 until 400).map(i => (i.toLong, "g",
      if (i < 200) 7.0 else i.toDouble)) // 200 ties at 7.0
    val df = rows.toDF("event_id", "event_type", "value")
    val got = Stats.equiDepthBins(df, "event_type",
      floor(col("value") * 100), 8, Seq("event_id", "event_type"))
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    // monotone: larger value never gets a smaller bin
    val byVal = rows.map { case (id, _, v) => v -> got(id) }.sortBy(_._1)
    assert(byVal.sliding(2).forall(w => w.head._2 <= w.last._2))
    // the 200 tied rows share one bin (ties cannot straddle a boundary)
    assert(rows.filter(_._3 == 7.0).map(t => got(t._1)).toSet.size == 1)
    // non-degenerate: the un-tied half still spreads over several bins
    assert(rows.filter(_._3 != 7.0).map(t => got(t._1)).toSet.size >= 4)
  }

  test("tokenBudgetSample: saturated source keeps everything, " +
      "unweighted sources drop, heavier weight keeps more tokens") {
    val docs = Tables.documents(spark, Sf001)
    val weights = Seq(("src0", 8), ("src1", 4), ("src3", 1))
    val out = Sampling.tokenBudgetSample(docs, "doc_id", "source",
      graft.operators.TextOps.tokenCount(col("text")), weights, 3000L)
    val bySrc = out.groupBy("source").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc.keySet == Set("src0", "src1", "src3")) // whitelist
    // src0's 1500-token share exceeds its ~1435 supply → keeps all 25
    assert(bySrc("src0") == 25L, bySrc)
    assert(bySrc("src1") < 25L && bySrc("src3") < 25L)
    assert(bySrc("src1") > bySrc("src3")) // 4x weight keeps more
    // append-stable: same draws on a reshuffled input
    val re = Sampling.tokenBudgetSample(docs.repartition(7), "doc_id",
      "source", graft.operators.TextOps.tokenCount(col("text")),
      weights, 3000L).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(re == out.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("tokenBudgetSample: a source whose docs all tokenize empty is " +
      "dropped (t_s=0 guard), not kept wholesale via inf→MaxValue") {
    import spark.implicits._
    val docs = Seq(
      (1L, "real", "some actual tokens here"),
      (2L, "real", "more actual tokens here"),
      (3L, "ghost", "   "), // whitespace-only: 0 tokens
      (4L, "ghost", "")
    ).toDF("doc_id", "source", "text")
    val out = Sampling.tokenBudgetSample(docs, "doc_id", "source",
      graft.operators.TextOps.tokenCount(col("text")),
      Seq(("real", 1), ("ghost", 1)), 1000L)
      .select("doc_id", "source").collect()
    assert(out.forall(_.getString(1) == "real"), out.mkString(","))
    assert(out.length == 2) // saturated real source keeps both
  }
}
