package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.ScalarOps
import graft.sinks.StarSchemaSink

/** Property tests (SURVEY §5.5) with plain scalacheck generators
  * (scalatestplus isn't in the offline cache): fixed-seed sample
  * batches evaluated data-parallel — one Spark job per property, the
  * per-row assertion expressed as a column.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int): List[A] =
    Iterator.iterate((Seed(42L), List.empty[A])) { case (seed, acc) =>
      val r = gen.pureApply(Gen.Parameters.default, seed)
      (seed.next, r :: acc)
    }.drop(n).next()._2

  test("property: F5 truncation matches python int((f-32)*5/9) on 2000 samples") {
    val xs = samples(Gen.choose(-200.0, 200.0), 2000)
    val df = xs.map(f => (f, ((f - 32) * 5 / 9).toInt)).toDF("f", "expected")
    val bad = df.filter(ScalarOps.f2c($"f") =!= $"expected").count()
    assert(bad == 0L)
  }

  test("property: F3 tenth-rescale truncates toward zero for any int") {
    val xs = samples(Gen.choose(-5000, 5000), 2000)
    val df = xs.map(t => (t, (t * 0.1).toInt)).toDF("t", "expected")
    val bad = df.filter(ScalarOps.tenthsToUnit($"t") =!= $"expected").count()
    assert(bad == 0L)
  }

  test("property: F7 dispatch parse equals the coalesce fallback chain") {
    val dateGen = Gen.zip(Gen.choose(1990, 2030), Gen.choose(1, 12), Gen.choose(1, 28))
    val strGen = Gen.zip(dateGen, Gen.oneOf(true, false)).map {
      case ((y, m, dd), dayFirst) =>
        if (dayFirst) f"$dd-$m-$y" else f"$y%04d-$m-$dd"
    }
    val df = samples(strGen, 2000).toDF("dstr")
    val bad = df.filter(
      ScalarOps.parseDateMultiFast($"dstr") <=> ScalarOps.parseDateMulti($"dstr")
        === false).count()
    assert(bad == 0L)
  }

  test("property: min-max normalization spans exactly [0,1]") {
    val lists = samples(
      Gen.nonEmptyListOf(Gen.choose(-1e6, 1e6)).suchThat(_.toSet.size > 1), 10)
    lists.foreach { xs =>
      val df = xs.toDF("v")
      val mm = df.agg(min("v").as("mn"), max("v").as("mx"))
      val r = df.crossJoin(broadcast(mm))
        .select((($"v" - $"mn") / ($"mx" - $"mn")).as("n"))
        .agg(min("n"), max("n")).first()
      assert(r.getDouble(0) == 0.0 && r.getDouble(1) == 1.0, xs.take(5))
    }
  }

  test("property: sink append is idempotent for arbitrary batches") {
    val tsGen = Gen.choose(0, 99).map(h =>
      Timestamp.valueOf(f"2022-01-${1 + h / 24}%02d ${h % 24}%02d:00:00"))
    val rowGen = Gen.zip(tsGen, Gen.choose(0, 50), Gen.choose(-20, 40),
      Gen.oneOf(true, false))
    samples(Gen.nonEmptyListOf(rowGen), 5).foreach { rows =>
      val wh = tmpDir("wh-prop")
      StarSchemaSink.createTables(spark, wh)
      val batch = rows.toDF("DateTime", "WindSpeed", "Temperature", "Precipitation")
      val n1 = StarSchemaSink.idempotentAppend(
        spark, wh, "weather", batch, Seq("DateTime"))
      val n2 = StarSchemaSink.idempotentAppend(
        spark, wh, "weather", batch, Seq("DateTime"))
      assert(n1 == rows.map(_._1).distinct.size.toLong)
      assert(n2 == 0L)
    }
  }

  test("property: TopKPerGroup == window row_number on arbitrary data") {
    // skewed groups (incl. dupe values for tie-break coverage), odd k
    val gen = for {
      g <- Gen.choose(0, 7)
      v <- Gen.choose(-50, 50)
      id <- Gen.choose(0L, 10000L)
    } yield (g, v, id)
    val rows = samples(gen, 3000).distinct
    val df = rows.toDF("g", "v", "id")
    for (k <- Seq(1, 4, 17)) {
      val got = graft.operators.TopK.perGroup(df, Seq("g"),
        Seq(col("v").desc, col("id")), k)
        .orderBy("g", "rn").collect().toSeq
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("g").orderBy(col("v").desc, col("id"))
      val want = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k).orderBy("g", "rn").collect().toSeq
      assert(got == want, s"k=$k")
    }
  }

  test("property: HLL estimate within 3*rse for cardinalities 50..50k") {
    for (n <- Seq(50, 500, 5000, 50000)) {
      val df = spark.range(n.toLong).toDF("id").withColumn("g", lit("x"))
      val est = graft.operators.Sketch.hllEstimate(df, Seq("g"), "id")
        .collect().head.getAs[Long]("hll_est").toDouble
      // m=256 → rse ≈ 1.04/16 ≈ 6.5%; linear counting tightens small n
      assert(math.abs(est - n) / n < 0.195, s"n=$n est=$est")
    }
  }

  test("property: IVF recall holds across seeds and distributions") {
    // clustered (the regime IVF is built for) and uniform (its worst
    // case) vectors, several RNG seeds each — recall vs brute force
    // must clear the gate every time, not just on one fixture.
    val dim = 16; val k = 5; val nQ = 15; val nC = 400
    def recallFor(seed: Long, clustered: Boolean): Double = {
      val rnd = new scala.util.Random(seed)
      val centers = Array.fill(8)(Array.fill(dim)(rnd.nextGaussian() * 3))
      def vec(): Array[Float] = {
        val base =
          if (clustered) centers(rnd.nextInt(centers.length))
          else Array.fill(dim)(0.0)
        Array.tabulate(dim)(i => (base(i) + rnd.nextGaussian()).toFloat)
      }
      val cands = (0 until nC).map(i => (i.toLong, vec())).toDF("cid", "cvec")
      val queries = (0 until nQ).map(i => (i.toLong + 100000, vec()))
        .toDF("qid", "qvec")
      val exact = graft.operators.Similarity
        .bruteForceTopK(queries, cands, k)
        .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val ivf = graft.operators.Similarity
        .ivfTopK(queries, cands, k, nCentroids = 8, nProbe = 3, seed = seed)
        .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      exact.intersect(ivf).size.toDouble / exact.size
    }
    for (seed <- Seq(1L, 2L, 3L)) {
      val rc = recallFor(seed, clustered = true)
      val ru = recallFor(seed, clustered = false)
      info(f"seed=$seed clustered recall@5=$rc%.2f uniform recall@5=$ru%.2f (nProbe=3/8)")
      assert(rc >= 0.60, f"clustered recall $rc%.2f below gate (seed=$seed)")
      assert(ru >= 0.40, f"uniform recall $ru%.2f below gate (seed=$seed)")
    }
  }

  test("property: TextRepetition matches an independent reference on random text") {
    // reference implementation: plain Scala, same tokenization contract
    def ref(s: String): (Int, Option[Double], Int, Option[Double]) = {
      val toks = s.split("\\s+").filter(_.nonEmpty)
      def grams(k: Int) = toks.sliding(k).filter(_.length == k)
        .map(_.mkString(" ")).toSeq
      val g2 = grams(2); val g3 = grams(3)
      val top2 = if (g2.isEmpty) None
        else Some(g2.groupBy(identity).values.map(_.size).max.toDouble / g2.size)
      val dup3 = if (g3.isEmpty) None
        else {
          val c = g3.groupBy(identity).values.map(_.size)
          Some(c.filter(_ > 1).sum.toDouble / g3.size)
        }
      (g2.size, top2, g3.size, dup3)
    }
    val word = Gen.oneOf("a", "b", "ab", "xyz", "Φοο", "7")
    val sep = Gen.oneOf(" ", "  ", "\t", " \t ")
    val textGen = for {
      n <- Gen.choose(0, 30)
      ws <- Gen.listOfN(n, word)
      ss <- Gen.listOfN(math.max(n - 1, 0), sep)
    } yield (ws, ss).zipped.map(_ + _).mkString + ws.drop(ss.size).mkString
    val texts = samples(textGen, 300) ++ Seq("", " ", "solo", "a a a a a a")
    val got = texts.toDF("text")
      .select(col("text"), graft.expressions.TextRepetition(col("text")).as("r"))
      .collect()
    got.foreach { row =>
      val (n2, top2, n3, dup3) = ref(row.getString(0))
      val r = row.getStruct(1)
      assert(r.getInt(0) == n2, s"'${row.getString(0)}' n2")
      assert((if (r.isNullAt(1)) None else Some(r.getDouble(1))) == top2)
      assert(r.getInt(2) == n3)
      assert((if (r.isNullAt(3)) None else Some(r.getDouble(3))) == dup3)
    }
  }

  test("property: zValue2 interleave round-trips and preserves " +
      "rectangle locality on 2000 random pairs") {
    val gen = Gen.zip(Gen.chooseNum(0, 65535), Gen.chooseNum(0, 65535))
    val pairs = samples(gen, 2000)
    val got = pairs.toDF("x", "y")
      .select(col("x"), col("y"),
        graft.operators.ZOrder.zValue2(col("x"), col("y")).as("z"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    def interleaveTop(xh: Int, yh: Int): Long =
      (0 until 8).foldLeft(0L) { (acc, i) =>
        acc | (((xh >> i) & 1L) << (2 * i)) | (((yh >> i) & 1L) << (2 * i + 1))
      }
    got.foreach { case (x, y, z) =>
      // deinterleave: even bits back to x, odd bits to y — exact inverse
      var rx = 0L; var ry = 0L
      (0 until 16).foreach { i =>
        rx |= ((z >> (2 * i)) & 1L) << i
        ry |= ((z >> (2 * i + 1)) & 1L) << i
      }
      assert(rx == x && ry == y, s"roundtrip failed for ($x,$y) -> $z")
      // locality: a z-prefix (top 2k bits) pins x and y each to a
      // 2^(16-k) aligned window — the property file min/max pruning
      // rides on. Check k=8: same top-16 z bits ⇒ same top-8 of both
      assert(((z >> 16) & 0xFFFF) ==
        interleaveTop(x >> 8, y >> 8), s"prefix mismatch ($x,$y)")
    }
  }

  test("property: containmentPairs finds every planted token-aligned " +
      "substring and invents none, on 60 random corpora rows") {
    // random word docs; for every even id, doc id+1 is a random
    // contiguous token slice of it (≥ w tokens) — must be reported
    val word = Gen.oneOf("ox", "elk", "bat", "cod", "ant", "fox", "owl",
      "ram", "eel", "jay", "koi", "yak")
    val docGen = Gen.listOfN(24, word)
    val bases = samples(docGen, 30)
    val rows = bases.zipWithIndex.flatMap { case (toks, i) =>
      val id = i.toLong * 2
      val off = (i * 7) % 12
      val len = 6 + (i % 8) // 6..13 tokens, ≥ w=4
      val sub = toks.slice(off, off + len)
      Seq((id, toks.mkString(" ")), (id + 1, sub.mkString(" ")))
    }
    val df = rows.toDF("id", "text")
    val got = graft.operators.Dedup.containmentPairs(df, "id", "text", w = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every planted (id+1 ⊂ id) pair reported (token-aligned slices
    // are substrings; strict length inequality holds since len < 24)
    val planted = bases.indices.map(i => (i.toLong * 2 + 1, i.toLong * 2))
    planted.foreach(p => assert(got.contains(p), s"missing planted $p"))
    // nothing reported that isn't a true substring with shorter length
    val texts = rows.toMap
    got.foreach { case (in, out) =>
      assert(texts(in).length < texts(out).length
        && texts(out).contains(texts(in)), s"false positive ($in,$out)")
    }
  }

  test("property: winsorize and equi-depth bins match driver-side exact " +
      "order statistics on random multi-group data with ties") {
    val rowGen = Gen.zip(Gen.choose(0, 3), Gen.choose(-500, 500))
    val rows = samples(rowGen, 1200).zipWithIndex
      .map { case ((g, v), i) => (i.toLong, s"g$g", v.toLong) }
    val df = rows.toDF("id", "grp", "xl")
    // driver references, same ceil(p*n) discrete selection rule
    def disc(v: Seq[Long], p: Double): Long = {
      val s = v.sorted
      s(math.max(math.ceil(p * s.length).toInt, 1) - 1)
    }
    val byG = rows.groupBy(_._2).map { case (g, rs) => g -> rs.map(_._3) }
    // winsorize: every value clamps into [p05, p95]
    val w = graft.operators.Stats.winsorize(df, "grp", col("xl"), 0.05, 0.95,
        Seq("id", "grp")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    w.foreach { case (id, g, xlw) =>
      val xs = byG(g)
      val lo = disc(xs, 0.05); val hi = disc(xs, 0.95)
      val x = rows(id.toInt)._3
      assert(xlw == math.min(math.max(x, lo), hi), s"id=$id")
    }
    // equi-depth: bin == 1 + #boundaries strictly below the value
    val b = graft.operators.Stats.equiDepthBins(df, "grp", col("xl"), 8,
        Seq("id", "grp")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    b.foreach { case (id, g, bin) =>
      val xs = byG(g)
      val bounds = (1 until 8).map(k => disc(xs, k / 8.0))
      val x = rows(id.toInt)._3
      assert(bin == 1 + bounds.count(_ < x), s"id=$id x=$x bin=$bin")
    }
  }

  test("property: NL holiday calendar invariants for every year 1990-2035") {
    (1990 to 2035).foreach { year =>
      val h = graft.functions.NLHolidays.forYear(year)
      assert(h.size == 11)
      assert(h.contains(java.time.LocalDate.of(year, 1, 1)))
      assert(h.contains(java.time.LocalDate.of(year, 12, 25)))
      val easter = graft.functions.NLHolidays.easterSunday(year)
      assert(easter.getDayOfWeek == java.time.DayOfWeek.SUNDAY)
      assert(easter.getMonthValue == 3 || easter.getMonthValue == 4)
      // King's Day is never a Sunday (shift rule)
      assert(graft.functions.NLHolidays.koningsdag(year).getDayOfWeek
        != java.time.DayOfWeek.SUNDAY)
    }
  }

  test("property: Geo.radiusJoin == brute force on random scatters incl. negatives") {
    // three (radius, spread) regimes: dense cluster, sparse spread,
    // and a mixed-sign band hugging the cell boundaries
    val regimes = Seq((50L, 200L), (1000L, 800L), (128L, 300L))
    regimes.zipWithIndex.foreach { case ((r, spread), ri) =>
      val ptGen = Gen.zip(Gen.choose(-spread, spread), Gen.choose(-spread, spread))
      val pts = samples(ptGen, 300).zipWithIndex
        .map { case ((la, lo), i) => (i.toLong + ri * 1000, la, lo) }
        .toDF("id", "lat", "lon")
      val got = graft.operators.Geo.radiusJoin(pts, "id", "lat", "lon", r)
        .orderBy("id_a", "id_b").collect().toSeq
      val a = pts.select($"id".as("id_a"), $"lat".as("la"), $"lon".as("loa"))
      val b = pts.select($"id".as("id_b"), $"lat".as("lb"), $"lon".as("lob"))
      val want = a.crossJoin(b).filter($"id_a" < $"id_b")
        .withColumn("dist2", ($"la" - $"lb") * ($"la" - $"lb") +
          ($"loa" - $"lob") * ($"loa" - $"lob"))
        .filter($"dist2" <= lit(r * r))
        .select("id_a", "id_b", "dist2")
        .orderBy("id_a", "id_b").collect().toSeq
      assert(got == want, s"regime r=$r spread=$spread: " +
        s"${got.size} grid pairs vs ${want.size} brute pairs")
      assert(want.nonEmpty, s"regime r=$r spread=$spread produced no pairs")
    }
  }

  test("property: weightedJaccardPairs matches a driver-side multiset reference") {
    val wordGen = Gen.oneOf("a", "b", "c", "d", "e", "f")
    val docGen = Gen.listOfN(12, wordGen).map(_.mkString(" "))
    val docs = samples(docGen, 40).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val got = graft.operators.Dedup.weightedJaccardPairs(
        docs.toDF("doc_id", "text"), "doc_id", "text",
        minSimPpm = 0L, maxTokenDocFreq = 1000)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(5))).toMap
    def tf(t: String) = t.split("\\s+").filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val tfs = docs.map { case (i, t) => i -> tf(t) }.toMap
    for ((i, ti) <- tfs; (j, tj) <- tfs if i < j) {
      val keys = ti.keySet ++ tj.keySet
      val mn = keys.toSeq.map(k => math.min(ti.getOrElse(k, 0L), tj.getOrElse(k, 0L))).sum
      val mx = keys.toSeq.map(k => math.max(ti.getOrElse(k, 0L), tj.getOrElse(k, 0L))).sum
      val expected = if (mn == 0) None else Some(mn * 1000000L / mx)
      assert(got.get((i, j)) == expected,
        s"pair ($i,$j): got ${got.get((i, j))}, want $expected")
    }
  }
}
