package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Similarity-search correctness: brute force against an in-memory
  * reference computation, and LSH recall against brute force on the
  * real embeddings table.
  */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine column matches scala computation exactly") {
    val df = Seq(
      (0L, Array(1.0f, 0.0f), 1L, Array(1.0f, 1.0f)),
      (1L, Array(0.0f, 2.0f), 2L, Array(0.0f, -3.0f)))
      .toDF("qid", "qvec", "cid", "cvec")
    val got = df.select(Similarity.cosine(col("qvec"), col("cvec")))
      .collect().map(_.getDouble(0))
    assert(math.abs(got(0) - 1.0 / math.sqrt(2)) < 1e-15)
    assert(got(1) == -1.0)
  }

  test("groupCentroids: exact element-wise means, micros-deterministic " +
      "across repartitionings") {
    val df = Seq(
      (0, Array(1.0f, 2.0f)), (0, Array(3.0f, 4.0f)),
      (1, Array(-1.5f, 0.5f))).toDF("label", "embedding")
    def run(d: org.apache.spark.sql.DataFrame) =
      Similarity.groupCentroids(d, "label", "embedding")
        .orderBy("label").collect()
        .map(r => (r.getInt(0), r.getSeq[Double](1).toList, r.getLong(2)))
    val got = run(df)
    assert(got(0) == ((0, List(2.0, 3.0), 2L)))
    assert(got(1) == ((1, List(-1.5, 0.5), 1L)))
    assert(run(df.repartition(7)).toList == got.toList)
  }

  test("randomProjection: a basis vector projects to exactly the " +
      "plane family's matching column; deterministic across calls") {
    val df = Seq((0L, Array.tabulate(5)(i => if (i == 2) 1.0 else 0.0)))
      .toDF("id", "v")
    val planes = Similarity.hyperplaneValues(dim = 5, bits = 3)
    val got = df.select(
        Similarity.randomProjection(col("v"), dim = 5, outDim = 3).as("p"))
      .collect()(0).getSeq[Double](0)
    assert(got == planes.map(_(2)).toSeq, got.toString)
  }

  test("projectedTopK: full recall on planted separable structure " +
      "(the JL regime), exact re-rank scores, deterministic") {
    // 4 groups of 10 vectors on distinct basis directions (within-
    // group cos ~1, cross-group ~0) + deterministic jitter: the
    // neighbor gap dwarfs JL-at-8 distortion, so the projected
    // candidate stage must recall every same-group neighbor
    val vecs = (0L until 40L).map { i =>
      val g = (i % 4).toInt
      val v = Array.tabulate(64) { j =>
        (if (j == g * 16) 1.0 else 0.0) +
          0.01 * (((i * 37 + j * 11) % 7).toDouble - 3.0)
      }
      (i, v)
    }.toDF("cid", "cvec")
    val queries = vecs.filter($"cid" < 4)
      .select($"cid".as("qid"), $"cvec".as("qvec"))
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "cid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(queries, vecs, 5))
    val got = pairs(Similarity.projectedTopK(queries, vecs, dim = 64,
      outDim = 8, m = 15, k = 5))
    assert(got == exact, s"ann=$got\nexact=$exact")
    // every hit is a same-group member
    assert(got.forall { case (q, c) => q % 4 == c % 4 }, got.toString)
    assert(pairs(Similarity.projectedTopK(queries, vecs, 64, 8, 15, 5))
      == got) // deterministic end-to-end
  }

  test("semanticDedup: min-id survivor per semantic group, distinct " +
      "topics both survive, partitioning-invariant") {
    // cluster A near (1,0): ids 0,1,2 mutually cos≈1 -> only 0 survives;
    // id 3 near (0,1): same nearest center possible? no — centers are
    // (1,0) and (0,1), so 3 clusters alone and survives; id 4 = -A
    // direction, lands in cluster A's cell but cos is NEGATIVE -> kept
    val vecs = Seq(
      (0L, Array(1.0, 0.0)), (1L, Array(0.999, 0.01)),
      (2L, Array(0.998, -0.01)), (3L, Array(0.0, 1.0)),
      (4L, Array(-1.0, -0.002))).toDF("cid", "cvec")
    val centers = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    def run(d: org.apache.spark.sql.DataFrame) =
      Similarity.semanticDedup(d, centers, minCosine = 0.9)
        .select("cid").collect().map(_.getLong(0)).toSet
    val got = run(vecs)
    assert(got == Set(0L, 3L, 4L), got.toString)
    assert(run(vecs.repartition(7)) == got)
    // star cap: with maxCluster = 1 every cluster pairs via its min-id
    // rep only — 1 and 2 still drop (both near rep 0), nothing else
    val capped = Similarity.semanticDedup(vecs, centers,
      minCosine = 0.9, maxCluster = 1)
      .select("cid").collect().map(_.getLong(0)).toSet
    assert(capped == Set(0L, 3L, 4L), capped.toString)
  }

  test("kmeansStep: assignment to nearest literal center, then exact " +
      "cluster means") {
    val vecs = Seq(
      (0L, Array(1.0f, 1.0f)), (1L, Array(2.0f, 0.0f)),
      (2L, Array(9.0f, 9.0f))).toDF("cid", "cvec")
    val centers = Array(Array(0.0, 0.0), Array(10.0, 10.0))
    val got = Similarity.kmeansStep(vecs, centers)
      .orderBy("cluster").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toList, r.getLong(2)))
    assert(got.toList == List(
      (0, List(1.5, 0.5), 2L),
      (1, List(9.0, 9.0), 1L)))
  }

  test("farthestPointSeeds: picks planted extremes in maxmin order " +
      "with exact pick-time distances") {
    val vecs = ((0L until 20L).map(i => (i, Array(0.01 * i, 0.0))) ++
      Seq((100L, Array(100.0, 0.0)), (101L, Array(0.0, 80.0)),
        (102L, Array(-60.0, 0.0)))).toDF("cid", "cvec")
    val got = Similarity.farthestPointSeeds(vecs, k = 4)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toList
    assert(got == List(
      (1, 0L, 0L), // min-id start
      (2, 100L, 10000000000L), // d2 = 100^2 micros
      (3, 101L, 6400000000L), // min(80^2, 100^2+80^2) = 6400
      (4, 102L, 3600000000L)), got.toString) // min(60^2, 160^2, ...)
    val re = Similarity.farthestPointSeeds(vecs.repartition(7), k = 4)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toList
    assert(re == got)
  }

  test("farthestPointSeeds: exact-duplicate vectors never produce a " +
      "repeated seed id") {
    // 3 distinct positions, each duplicated — k=5 exceeds the distinct
    // count, so picks 4 and 5 must fall back to duplicate positions
    // with d2m = 0 but still-distinct cids
    val vecs = Seq(
      (0L, Array(0.0, 0.0)), (1L, Array(0.0, 0.0)),
      (2L, Array(9.0, 0.0)), (3L, Array(9.0, 0.0)),
      (4L, Array(0.0, 5.0)), (5L, Array(0.0, 5.0))).toDF("cid", "cvec")
    val got = Similarity.farthestPointSeeds(vecs, k = 5)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toList
    assert(got.map(_._2).distinct.size == 5, got.toString)
    assert(got.take(3).map(_._2) == List(0L, 2L, 4L), got.toString)
    assert(got.drop(3).forall(_._3 == 0L), got.toString) // dup positions
  }

  test("kmeans: converges to blob means; an empty seed carries " +
      "forward then drops from the final model; partitioning-" +
      "invariant") {
    // blob A around (0, 0), blob B around (10, 10); seeds: one member
    // of each blob plus a FAR seed (100, 100) that never wins a point
    val vecs = Seq(
      (0L, Array(0.0f, 0.0f)), (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f)),
      (3L, Array(10.0f, 10.0f)), (4L, Array(11.0f, 10.0f)),
      (5L, Array(10.0f, 11.0f))).toDF("cid", "cvec")
    val seeds = Array(Array(0.0, 0.0), Array(10.0, 10.0),
      Array(100.0, 100.0))
    def run(d: org.apache.spark.sql.DataFrame) =
      Similarity.kmeans(d, seeds, iters = 3)
        .orderBy("cluster").collect()
        .map(r => (r.getInt(0), r.getSeq[Double](1).toList, r.getLong(2)))
    val got = run(vecs)
    // blob means: (1/3, 1/3) -> micros floor .333333; (10.333333, 10.333333)
    assert(got.toList == List(
      (0, List(0.333333, 0.333333), 3L),
      (1, List(10.333333, 10.333333), 3L)), got.toList.toString)
    // far seed (cluster 2) never captured a member: carried between
    // rounds, absent from the final model
    assert(!got.map(_._1).contains(2))
    assert(run(vecs.repartition(5)).toList == got.toList)
  }

  test("EmbeddingCuration.curateAuto: learns blob centers from the " +
      "data, drops the planted outlier and the near-dups, respects " +
      "the quota") {
    // two tight blobs of 6 + a far outlier; inside blob A, ids 0 and
    // 1 are near-identical directions from the centroid region —
    // semantic near-dups after the outlier gate
    def jit(i: Long, j: Int) = 0.003 * (((i * 31 + j * 7) % 5).toDouble - 2)
    val rows =
      (0L until 6L).map(i => (i, Array(1.0 + jit(i, 0), jit(i, 1)))) ++
      (10L until 16L).map(i => (i, Array(jit(i, 0), 1.0 + jit(i, 1)))) ++
      Seq((99L, Array(30.0, 30.0)))
    val vecs = rows.toDF("cid", "cvec")
    val got = graft.pipelines.EmbeddingCuration.curateAuto(
        vecs, k = 3, iters = 2, zMax = 1.5, minCosine = 0.999,
        maxCluster = 10, quota = 3)
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    val byCluster = got.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byCluster.values.forall(_.size <= 3), byCluster.toString)
    val kept = got.map(_._2).toSet
    assert(!kept.contains(99L), "far outlier must be gated") // z-gate
    // blob members survive in both blobs
    assert(kept.exists(_ < 6) && kept.exists(i => i >= 10 && i < 16),
      kept.toString)
    // deterministic end-to-end
    val re = graft.pipelines.EmbeddingCuration.curateAuto(
        vecs.repartition(7), k = 3, iters = 2, zMax = 1.5,
        minCosine = 0.999, maxCluster = 10, quota = 3)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(re == got.toSet)
  }

  test("clusterRepresentatives picks the k most central members per " +
      "cluster, matching a driver-side reference") {
    val e = Tables.embeddings(spark, Sf0001)
    val centers = e.filter(col("vec_id") < 4).orderBy("vec_id")
      .select(col("embedding").cast("array<double>")).collect()
      .map(_.getSeq[Double](0).toArray)
    val vecs = e.select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val got = Similarity.clusterRepresentatives(vecs, centers, k = 2)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(3)))

    val all = e.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    def d2(a: Array[Float], c: Array[Double]): Double = {
      var s = 0.0
      for (i <- c.indices) { val d = a(i).toDouble - c(i); s += d * d }
      s
    }
    val assigned = all.toSeq.map { case (id, v) =>
      val ds = centers.zipWithIndex.map { case (c, i) => (d2(v, c), i) }
      (id, ds.min._2, ds.min._1)
    }
    val expect = assigned.groupBy(_._2).flatMap { case (cl, members) =>
      members.sortBy { case (id, _, d) => (d, id) }.take(2).zipWithIndex
        .map { case ((id, _, _), i) => (cl, id, i + 1) }
    }.toSet
    assert(got.toSet == expect)
    // every cluster emits at most k reps, ranks are 1..k
    assert(got.groupBy(_._1).values.forall(g =>
      g.length <= 2 && g.map(_._3).sorted.sameElements(1 to g.length)))
  }

  test("brute-force top-k agrees with driver-side reference on sf0.001") {
    val e = Tables.embeddings(spark, Sf0001)
    val all = e.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cosRef(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
      }
      dot / math.sqrt(na * nb)
    }
    val expectTop3 = (0L until 3L).map { q =>
      q -> all.toSeq.filter(_._1 != q)
        .map { case (id, v) => (id, cosRef(all(q), v)) }
        .sortBy { case (id, c) => (-c, id) }.take(3).map(_._1)
    }.toMap

    val queries = e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val cands = e.select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val got = Similarity.bruteForceTopK(queries, cands, 3)
      .orderBy("qid", "rank")
      .collect().groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.sortBy(_.getInt(3)).map(_.getLong(1)).toSeq }
    assert(got == expectTop3)
  }

  test("LSH finds planted near-duplicates with high recall") {
    // LSH's regime is near-dup similarity (cosine > ~0.9), not generic
    // top-k over weakly-correlated vectors (recall collapses to the
    // sampled-fraction there — measured 4% at bits=8 on this table).
    import spark.implicits._
    val base = Tables.embeddings(spark, Sf0001)
      .filter(col("vec_id") < 20)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val rnd = new scala.util.Random(7)
    val planted = base.map { case (id, v) =>
      (id + 10000L, v.map(x => x + (rnd.nextGaussian() * 0.02).toFloat))
    }
    val queries = spark.createDataFrame(planted.toSeq)
      .toDF("qid", "qvec")
    val cands = Tables.embeddings(spark, Sf0001)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))

    // sanity: brute force ranks the original as top-1
    val bf = Similarity.bruteForceTopK(queries, cands, 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(base.forall { case (id, _) => bf(id + 10000L) == id })

    val lsh = Similarity.lshTopK(queries, cands, dim = 64, k = 5,
      bits = 6, probeBits = 6)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet }
    val hits = base.count { case (id, _) =>
      lsh.get(id + 10000L).exists(_.contains(id))
    }
    info(s"LSH planted-near-dup recall: $hits/20")
    assert(hits >= 16, s"only $hits/20 planted dups found")
  }

  test("IVF top-k beats sampled-fraction baseline on generic queries") {
    val e = Tables.embeddings(spark, Sf001)
    val queries = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val cands = e.select(col("vec_id").as("cid"), col("embedding").as("cvec"))

    val exact = Similarity.bruteForceTopK(queries, cands, 5)
      .select("qid", "cid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(queries, cands, k = 5,
      nCentroids = 16, nProbe = 4)
      .select("qid", "cid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val recall = exact.intersect(ivf).size.toDouble / exact.size
    info(f"IVF recall@5 = $recall%.2f (nProbe=4/16 ≈ 25%% of lists)")
    assert(recall >= 0.45, f"IVF recall $recall%.2f below gate")
  }

  test("PQ: trained codebooks beat the pinned-row codebooks on " +
      "reconstruction, ADC top-5 recalls exact-L2 neighbors") {
    val e = Tables.embeddings(spark, Sf001)
    val cands = e.select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val queries = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

    val pinnedRows = e.filter(col("vec_id") < 16).orderBy("vec_id")
      .select(col("embedding").cast("array<double>")).collect()
      .map(_.getSeq[Double](0).toArray)
    val pinned = Similarity.pqCodebooksFromRows(pinnedRows, m = 8)

    // codes well-formed; at the SAME geometry (m=8, ksub=16) the
    // trained quantizer reconstructs strictly better in aggregate
    // than arbitrary data rows as codebooks
    def recon(cb: Array[Array[Array[Double]]]): Long =
      Similarity.pqEncode(cands, cb)
        .agg(sum("recon_micros")).collect().head.getLong(0)
    val encPinned = Similarity.pqEncode(cands, pinned)
    assert(encPinned.filter(size(col("codes")) =!= 8).count() == 0)
    assert(encPinned.filter(
      exists(col("codes"), c => c < 0 || c >= 16)).count() == 0)
    val (rp, rt) = (recon(pinned), recon(Similarity.pqTrain(cands, 8, 16)))
    info(f"total recon error: pinned=$rp trained=$rt (${rt.toDouble / rp}%.2f×)")
    assert(rt < rp)

    // exact L2 top-5 (the ADC ground truth is distance, not cosine)
    val scored = cands.crossJoin(broadcast(queries))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        graft.expressions.VecExpressions.vec_d2(col("qvec"), col("cvec"))
          .as("d2"))
    val exact = graft.operators.TopK.perGroup(scored, Seq("qid"),
        Seq(col("d2").asc, col("cid")), 5, rankName = "rank")
      .select("qid", "cid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    // production geometry: raw ADC clears a floor; ADC-shortlist →
    // exact re-rank recovers near-exact recall with vectors touched
    // only for |Q|·50 rows
    val trained = Similarity.pqTrain(cands, m = 16, ksub = 64)
    val codes = Similarity.pqEncode(cands, trained).select("cid", "codes")
    val adc = Similarity.pqAdcTopK(queries, codes, trained, k = 5)
      .select("qid", "cid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val rawRecall = exact.intersect(adc).size.toDouble / exact.size
    val rer = Similarity.pqAdcRerankTopK(queries, cands, codes, trained,
        k = 5, shortlist = 50)
      .select("qid", "cid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val rerRecall = exact.intersect(rer).size.toDouble / exact.size
    info(f"PQ recall@5 (m=16, ksub=64): raw ADC $rawRecall%.2f, " +
      f"ADC-50 + exact re-rank $rerRecall%.2f")
    assert(rawRecall >= 0.35, f"raw ADC recall $rawRecall%.2f below floor")
    assert(rerRecall >= 0.9, f"re-rank recall $rerRecall%.2f below gate")
  }

  test("IVF-ADC: every candidate in exactly one list, residual codes " +
      "well-formed, top-5 recalls exact-L2 neighbors at production " +
      "geometry") {
    val e = Tables.embeddings(spark, Sf001)
    val cands = e.select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val queries = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

    // coarse quantizer = full-dim Lloyd's (pqTrain at m=1 IS that);
    // residual codebooks trained on residual-space rows, as production
    // IVFPQ does — raw-row codebooks would mis-frame the origin-
    // centered residuals
    val centers = Similarity.pqTrain(cands, m = 1, ksub = 16)(0)
    val resRows = cands.select(col("cvec").cast("array<double>"))
      .limit(256).collect().map(_.getSeq[Double](0).toArray)
      .map { x =>
        val c = centers(Similarity.nearestCenter(x, centers))
        Array.tabulate(x.length)(i => x(i) - c(i))
      }
    val resDf = spark.createDataFrame(
      resRows.toIndexedSeq.zipWithIndex.map { case (r, i) => (i.toLong, r) })
      .toDF("cid", "cvec")
    val cb = Similarity.pqTrain(resDf, m = 16, ksub = 64)

    val index = Similarity.ivfPqEncode(cands, centers, cb)
    // partition function: one list per candidate, codes in range
    assert(index.count() == cands.count())
    assert(index.filter(size(col("codes")) =!= 16).count() == 0)
    assert(index.filter(
      exists(col("codes"), c => c < 0 || c >= 64)).count() == 0)

    val scored = cands.crossJoin(broadcast(queries))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        graft.expressions.VecExpressions.vec_d2(col("qvec"), col("cvec"))
          .as("d2"))
    val exact = graft.operators.TopK.perGroup(scored, Seq("qid"),
        Seq(col("d2").asc, col("cid")), 5, rankName = "rank")
      .select("qid", "cid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Similarity.ivfPqTopK(queries, index, centers, cb,
        nProbe = 8, k = 5)
      .select("qid", "cid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(got).size.toDouble / exact.size
    info(f"IVF-ADC recall@5 (nProbe=8/16, m=16, ksub=64) = $recall%.2f")
    assert(recall >= 0.35, f"IVF-ADC recall $recall%.2f below floor")

    // IVFADC-R: the exact re-rank of a 50-candidate shortlist lifts
    // recall toward the probed lists' ceiling — must beat raw ADC
    val rer = Similarity.ivfPqRerankTopK(queries, cands, index,
        centers, cb, nProbe = 8, k = 5, shortlist = 50)
      .select("qid", "cid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val rerRecall = exact.intersect(rer).size.toDouble / exact.size
    info(f"IVFADC-R recall@5 (shortlist=50) = $rerRecall%.2f")
    assert(rerRecall > recall,
      f"re-rank $rerRecall%.2f did not beat raw ADC $recall%.2f")
    assert(rerRecall >= 0.6, f"re-rank recall $rerRecall%.2f below gate")
  }

  test("meanPairwiseCosine: moment identity matches the brute-force " +
      "pairwise mean within quantization ulp; singleton group NULL; " +
      "partitioning-invariant") {
    val e = Tables.embeddings(spark, Sf001)
    val got = Similarity.meanPairwiseCosine(e, "label", "embedding")
      .orderBy("label").collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap

    // brute-force reference: mean over ordered pairs i≠j of exact
    // cosine, per label
    val rows = e.select(col("label"),
        col("embedding").cast("array<double>")).collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
    rows.groupBy(_._1).foreach { case (label, members) =>
      val vs = members.map(_._2)
      def dot(a: Array[Double], b: Array[Double]) =
        a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
      val cos = for {
        i <- vs.indices; j <- vs.indices if i != j
      } yield dot(vs(i), vs(j)) / math.sqrt(dot(vs(i), vs(i)) * dot(vs(j), vs(j)))
      val ref = cos.sum / cos.size * 1e6
      val (n, ppm) = got(label)
      assert(n == vs.length)
      // micros quantization of each component perturbs a pair's dot
      // by ≤ ~2·dim/10⁶·10⁶ ppm... in practice ≪ 200 ppm
      assert(math.abs(ppm - ref) <= 200,
        s"label $label: got $ppm vs brute ${ref.round}")
    }

    // singleton group → NULL (no pairs); identity unchanged by
    // partitioning
    import spark.implicits._
    val single = Seq((0, Array(1.0f, 0.0f)), (1, Array(0.6f, 0.8f)),
      (1, Array(0.6f, 0.8f))).toDF("label", "embedding")
    val sRows = Similarity.meanPairwiseCosine(single, "label", "embedding")
      .orderBy("label").collect()
    assert(sRows(0).isNullAt(2), "singleton must have NULL mean")
    assert(sRows(1).getLong(2) >= 999998, "identical pair ≈ 10⁶ ppm")

    val p1 = Similarity.meanPairwiseCosine(e.repartition(1), "label", "embedding")
      .orderBy("label").collect().toSeq
    val p7 = Similarity.meanPairwiseCosine(e.repartition(7), "label", "embedding")
      .orderBy("label").collect().toSeq
    assert(p1 == p7, "partitioning changed the exact integer result")
  }

  test("hardNegativesTopK: only other-class candidates rank; the " +
      "planted near-twin of another class is the #1 hard negative") {
    import spark.implicits._
    // anchor class 0 at x-axis; class-0 twin must NOT appear;
    // class-1 near-twin is the hardest negative, class-1 orthogonal
    // vector ranks after it
    val anchors = Seq((1L, Array(1.0f, 0.0f), 0)).toDF("qid", "qvec", "qlabel")
    val cands = Seq(
      (2L, Array(0.999f, 0.01f), 0), // same class — excluded
      (3L, Array(0.99f, 0.14f), 1), // other class, near — hardest
      (4L, Array(0.0f, 1.0f), 1), // other class, orthogonal
      (1L, Array(1.0f, 0.0f), 1)) // same id — excluded even cross-class
      .toDF("cid", "cvec", "clabel")
    val got = Similarity.hardNegativesTopK(anchors, cands, k = 3)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getInt(3)))
    assert(got.toSeq == Seq((3L, 1), (4L, 2)), got.toSeq)
  }

  test("mmrSelect: diversifies past the paraphrase wall — round 2 " +
      "skips the near-dup of round 1's pick; rounds are exclusive; " +
      "round-1 maxsim NULL") {
    import spark.implicits._
    // query along x; 1/2 are twins above the axis, 3 is 1's MIRROR
    // below it — equally relevant but diverse. Pure top-2 = {1, 2}
    // (the twin edges out the mirror's float rounding); at λ=½ the
    // twin's ~1.0 sim penalty sinks it, so MMR picks 1 then 3.
    val cands = Seq(
      (1L, Array(0.99f, 0.141f)),
      (2L, Array(0.99f, 0.142f)),
      (3L, Array(0.99f, -0.141f))).toDF("cid", "cvec")
    val got = Similarity.mmrSelect(cands, Array(1.0, 0.0), k = 3)
      .orderBy("round").collect()
    assert(got.map(_.getLong(1)).toSeq == Seq(1L, 3L, 2L),
      got.map(_.getLong(1)).toSeq)
    assert(got(0).isNullAt(3), "round-1 maxsim must be NULL")
    assert(got(0).getLong(4) == got(0).getLong(2),
      "round-1 score is pure relevance")
    // rounds 2+: score = rel − maxsim exactly
    (1 until 3).foreach { i =>
      assert(got(i).getLong(4) == got(i).getLong(2) - got(i).getLong(3))
    }
  }

  test("cosineNearDups returns only pairs above threshold, id_a < id_b") {
    val e = Tables.embeddings(spark, Sf001)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val pairs = Similarity.cosineNearDups(e, dim = 64, minCosine = 0.35,
      bits = 6)
    val rows = pairs.collect()
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
    assert(rows.forall(r => r.getDouble(2) >= 0.35))
  }

  test("cosineNearDups: planted hot bucket degrades to a star, O(F) not F²") {
    // 60 identical vectors land in one LSH bucket (identical sign
    // pattern); with maxBucket=4 the bucket is hot, so candidates must
    // be the star around the min id — 59 pairs, every one anchored at
    // id 0 — instead of the 1770 all-pairs of an uncapped self-join.
    val dim = 8
    val hot = (0L until 60L).map(i => (i, Array.fill(dim)(1.0f)))
    val cool = (100L until 104L).map(i =>
      (i, Array.tabulate(dim)(j => if (j % 2 == (i % 2).toInt) 1.0f else -1.0f)))
    val df = spark.createDataFrame(hot ++ cool).toDF("id", "vec")
    val pairs = Similarity.cosineNearDups(df, dim, minCosine = 0.99,
      bits = 6, maxBucket = 4).collect()
    val hotPairs = pairs.filter(_.getLong(1) < 100L)
    assert(hotPairs.length == 59, s"expected 59 star pairs, got ${hotPairs.length}")
    assert(hotPairs.forall(_.getLong(0) == 0L), "all hot pairs anchor at the rep")
  }

  test("crossCorpusCosineNearDups: cross-side pairs only; a batch " +
      "vector near a corpus vector is found, within-side twins are not " +
      "reported") {
    val dim = 8
    def v(seed: Int): Array[Float] =
      Array.tabulate(dim)(j => if (((seed >> j) & 1) == 1) 1.0f else -1.0f)
    // corpus: 0/1 are twins (within-side — must NOT pair); batch: 100
    // equals corpus 0 (must pair), 101 is its own pattern, 102/103 are
    // twins within the batch (must NOT pair)
    val corpus = Seq((0L, v(0xA5)), (1L, v(0xA5)), (2L, v(0x3C)))
    val batch = Seq((100L, v(0xA5)), (101L, v(0x59)),
      (102L, v(0x66)), (103L, v(0x66)))
    val a = spark.createDataFrame(corpus).toDF("id", "vec")
    val b = spark.createDataFrame(batch).toDF("id", "vec")
    val got = Similarity.crossCorpusCosineNearDups(a, b, dim,
        minCosine = 0.99, bits = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((0L, 100L)) && got.contains((1L, 100L)), got)
    assert(got.forall { case (x, y) => x < 100L && y >= 100L }, got)
    assert(!got.exists { case (_, y) => y == 102L || y == 103L })
  }

  test("ivfProbeRecallSweep: recall and scanned volume are monotone in " +
      "nProbe, and nProbe = nCentroids is the exact-recall anchor") {
    val dim = 16
    val rnd = new scala.util.Random(7)
    val rows = (0L until 200L).map { i =>
      (i, Array.fill(dim)(rnd.nextGaussian()))
    }
    val df = spark.createDataFrame(rows).toDF("id", "vec")
    val qs = df.filter(col("id") < 8)
      .select(col("id").as("qid"), col("vec").as("qvec"))
    val cs = df.select(col("id").as("cid"), col("vec").as("cvec"))
    val centers = rows.take(8).map(_._2.map(_.toDouble)).toArray
    val out = Similarity.ivfProbeRecallSweep(qs, cs, centers, k = 5,
        grid = Seq(1, 2, 4, 8))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(out.map(_._1).toSeq === Seq(1, 2, 4, 8))
    // both axes monotone nondecreasing in probe width
    assert(out.sliding(2).forall { case Array(a, b) =>
      a._2 <= b._2 && a._3 <= b._3 })
    // probing every list IS the exact ranking
    assert(out.last._3 === 1000000L)
    // probing one list scans a strict subset
    assert(out.head._2 < out.last._2)
  }
}
