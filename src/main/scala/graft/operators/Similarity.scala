package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (array<float>).
  *
  * Two paths:
  *  - brute-force cosine top-k: exact, O(|Q|·|C|) — the correctness
  *    baseline, fine when |Q| is small (scoring a probe set);
  *  - random-hyperplane LSH buckets: candidates share a bucket key, so
  *    the join is bucket-co-located (shuffle on bucket, not all-pairs)
  *    — the 100 TB path; recall tunable via bits / multiprobe.
  *
  * All arithmetic is an ordered left fold in double precision
  * (`aggregate` over `zip_with`), which is bitwise-reproducible — and
  * matches a DuckDB `list_reduce` fold for the oracle.
  */
object Similarity {

  /** Ordered-fold dot product in double (deterministic). Composable
    * HOF rendering — kept as the semantic reference; the hot path uses
    * the codegen'd native expression below (bitwise-identical).
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def cosineHof(a: Column, b: Column): Column =
    dotHof(a, b) / sqrt(dotHof(a, a) * dotHof(b, b))

  /** Native codegen'd versions (graft.expressions.VecDot/VecCosine):
    * fused loop, no per-row intermediate arrays; same left-fold double
    * arithmetic as the HOF path.
    */
  def dot(a: Column, b: Column): Column =
    graft.expressions.VecExpressions.vec_dot(a, b)

  def cosine(a: Column, b: Column): Column =
    graft.expressions.VecExpressions.vec_cosine(a, b)

  /** Exact brute-force cosine top-k: for each query row, the k nearest
    * candidates (ties broken by candidate id). Broadcast the query
    * side — candidates stream map-side; the per-query top-k runs on
    * the TopKPerGroup heap plan (partial/exchange/final), so only
    * ≤ k·partitions rows per query ever shuffle. The row_number-window
    * rendering would sort EVERY candidate score per query — at 10⁹
    * candidates that sort is the job; the heap keeps the reduction
    * linear (same semantics, asserted by TopKSpec).
    */
  def bruteForceTopK(
      queries: DataFrame, // (qid, qvec)
      candidates: DataFrame, // (cid, cvec)
      k: Int): DataFrame = {
    val scored = candidates.crossJoin(broadcast(queries))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        cosine(col("qvec"), col("cvec")).as("cos"))
    TopK.perGroup(scored, Seq("qid"),
        Seq(col("cos").desc, col("cid")), k, rankName = "rank")
      .select("qid", "cid", "cos", "rank")
  }

  /** Deterministic random hyperplanes (fixed seed): the raw values —
    * exposed so oracle SQL can inline the identical planes and replay
    * bucket assignment bit-for-bit (sign of an ordered double fold).
    */
  def hyperplaneValues(dim: Int, bits: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(bits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  private def hyperplanes(dim: Int, bits: Int, seed: Long): Seq[Column] =
    hyperplaneValues(dim, bits, seed).toSeq.map(p => array(p.toSeq.map(lit): _*))

  /** Sign-random-projection bucket id (SimHash for vectors): one bit
    * per hyperplane. 2^bits buckets.
    */
  def lshBucket(vec: Column, dim: Int, bits: Int = 12, seed: Long = 42L): Column =
    hyperplanes(dim, bits, seed).zipWithIndex.map { case (h, i) =>
      when(dot(vec, h) >= 0, lit(1L << i)).otherwise(0L)
    }.reduce(_ + _)

  /** Two-stage ANN: candidate generation on [[randomProjection]]-
    * narrowed vectors, exact re-rank on the full ones — the standard
    * compressed-index retrieval shape. Stage 1 scores `m` candidates
    * per query on `outDim`-wide vectors (dim/outDim× less arithmetic
    * and scan width; here brute-force over the narrow table — at
    * 100 TB swap that stage for the IVF/LSH candidate generators,
    * which compose identically); stage 2 joins ONLY the m survivors
    * per query back to full vectors for the exact cosine top-k. Both
    * stages run on the TopKPerGroup heap plan; full vectors never
    * cross the wire except for the m·|queries| re-rank rows.
    *
    * Recall is the JL guarantee — and its fine print: projected
    * cosine preserves order within ε at outDim = O(log n / ε²), so
    * m > k absorbs inversions ONLY when the true neighbor gap exceeds
    * ε. Size outDim to the gap: real text embeddings (768–4096 dims,
    * near-dup cos ≫ background) compress 32–100× and keep recall;
    * a corpus whose neighbors sit barely above the cosine noise floor
    * (e.g. this repo's synthetic 64-dim table: best-neighbor 0.35 vs
    * p99 background 0.29) needs outDim beyond its input width — i.e.
    * projection is the wrong tool there, measured and documented
    * rather than papered over (SimilaritySpec gates recall on planted
    * separable structure; the oracle gates algorithm fidelity).
    */
  def projectedTopK(
      queries: DataFrame, // (qid, qvec)
      cands: DataFrame, // (cid, cvec)
      dim: Int,
      outDim: Int,
      m: Int,
      k: Int,
      seed: Long = 42L): DataFrame = {
    require(m >= k, s"candidate pool m=$m must cover k=$k")
    val qn = queries.select(col("qid"),
      randomProjection(col("qvec"), dim, outDim, seed).as("qvec"))
    val cn = cands.select(col("cid"),
      randomProjection(col("cvec"), dim, outDim, seed).as("cvec"))
    val stage1 = bruteForceTopK(qn, cn, m).select("qid", "cid")
    val exact = stage1
      .join(queries, Seq("qid"))
      .join(cands, Seq("cid"))
      .select(col("qid"), col("cid"),
        cosine(col("qvec"), col("cvec")).as("cos"))
    TopK.perGroup(exact, Seq("qid"),
        Seq(col("cos").desc, col("cid")), k, rankName = "rank")
      .select("qid", "cid", "cos", "rank")
  }

  /** Johnson–Lindenstrauss random projection to `outDim` components
    * (Gaussian planes, Vempala '04; the continuous form of
    * [[lshBucket]] — same seeded plane family, dots kept instead of
    * signs). The workhorse embedding compressor: distances are
    * preserved within (1±ε) at outDim = O(log n / ε²), so ANN
    * candidate generation, clustering, and near-dup scans can run on
    * vectors 8× narrower and join back to full vectors only for the
    * final exact re-rank.
    *
    * Map-only: planes inline as literals, each component is the
    * ordered double fold of [[graft.expressions.VecExpressions.vec_dot]]
    * — bitwise replayable in any engine, no shuffle, no state.
    */
  def randomProjection(vec: Column, dim: Int, outDim: Int,
      seed: Long = 42L): Column =
    array(hyperplanes(dim, outDim, seed).map(h => dot(vec, h)): _*)

  /** LSH-bucketed approximate top-k: candidates considered only inside
    * the query's bucket (exact cosine re-rank within). `probeBits=0`
    * is pure bucket match; >0 multiprobes neighbors at Hamming
    * distance 1 on the lowest `probeBits` planes to boost recall.
    */
  def lshTopK(
      queries: DataFrame, // (qid, qvec)
      candidates: DataFrame, // (cid, cvec)
      dim: Int,
      k: Int,
      bits: Int = 12,
      probeBits: Int = 4,
      seed: Long = 42L): DataFrame = {
    val cb = candidates.withColumn("bucket",
      lshBucket(col("cvec"), dim, bits, seed))
    val qBase = queries.withColumn("bucket0",
      lshBucket(col("qvec"), dim, bits, seed))
    // multiprobe expansion: original bucket + flips of low planes
    val probes = array(
      (col("bucket0") +: (0 until probeBits).map(i =>
        col("bucket0").bitwiseXOR(lit(1L << i)))): _*)
    val qb = qBase.select(col("qid"), col("qvec"),
      explode(probes).as("bucket"))
    // project to (qid, cid, cos) BEFORE the dedup+top-k reductions so
    // the embedding arrays never ride a shuffle; heap top-k instead of
    // a per-query sort window (see bruteForceTopK).
    val scored = qb.join(cb, Seq("bucket"))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        cosine(col("qvec"), col("cvec")).as("cos"))
      .dropDuplicates("qid", "cid")
    TopK.perGroup(scored, Seq("qid"),
        Seq(col("cos").desc, col("cid")), k, rankName = "rank")
      .select("qid", "cid", "cos", "rank")
  }

  /** IVF (inverted-file) approximate top-k: k-means centroids learned
    * from the candidate set; each candidate indexed under its nearest
    * centroid; a query probes its `nProbe` nearest centroids and
    * exact-ranks only those lists. Unlike hyperplane LSH (whose recall
    * collapses outside the near-duplicate regime), IVF adapts to the
    * data distribution — the right structure for generic ANN top-k.
    * At 100 TB the centroid model is tiny (trained on a sample) and
    * the probe join shuffles on the centroid id.
    */
  def ivfTopK(
      queries: DataFrame, // (qid, qvec)
      candidates: DataFrame, // (cid, cvec)
      k: Int,
      nCentroids: Int = 16,
      nProbe: Int = 4,
      seed: Long = 42L,
      trainFraction: Double = 1.0,
      maxIter: Int = 8,
      maxTrainRows: Int = 4096): DataFrame = {
    // The coarse quantizer is a tiny GLOBAL model: train it driver-side
    // with Lloyd's on a bounded sample (this is how IVF indexes train at
    // any scale — the sample is capped, not proportional). MLlib KMeans
    // here cost a Spark job per iteration for a 16-row model.
    val sampled =
      (if (trainFraction >= 1.0) candidates
       else candidates.sample(trainFraction, seed))
        .select(col("cvec").cast("array<double>"))
        .limit(maxTrainRows).collect()
        .map(_.getSeq[Double](0).toArray)
    val centers = lloyd(sampled, nCentroids, maxIter, seed)
    ivfTopKWithCenters(queries, candidates, k, centers, nProbe)
  }

  /** IVF probe/rank given an explicit coarse quantizer (the trained —
    * or deterministically chosen — centroid table). Split out so a
    * replayable centroid choice (e.g. "embeddings with vec_id < K")
    * yields a cross-engine-exact query while `ivfTopK` keeps the
    * sampled-Lloyd's production path.
    */
  /** Nearest-centroid ranking as a pure column expression: centroids
    * are literals, so both assignment and probing are map-side only —
    * the single shuffle in IVF-family operators is the probe join on
    * cluster. Element 1 of the sorted struct array is the assignment;
    * a prefix slice is the probe set. Ties break to the smaller
    * cluster id (struct sort on (d2, cluster)), replayed by the
    * oracle's ROW_NUMBER ORDER BY d2, cl.
    */
  private def centroidRanked(vec: Column, centers: Array[Array[Double]]): Column =
    array_sort(array(centers.zipWithIndex.map { case (c, i) =>
      val lits = array(c.map(lit).toSeq: _*)
      // native fused loop; same index-ordered fold as the HOF
      // zip_with/aggregate rendering (bitwise-identical values)
      val d2 = graft.expressions.VecExpressions.vec_d2(vec, lits)
      struct(d2.as("d2"), lit(i).as("cluster"))
    }.toSeq: _*))

  def ivfTopKWithCenters(
      queries: DataFrame, // (qid, qvec)
      candidates: DataFrame, // (cid, cvec)
      k: Int,
      centers: Array[Array[Double]],
      nProbe: Int): DataFrame = {
    def ranked(vec: Column): Column = centroidRanked(vec, centers)

    val indexed = candidates.withColumn("cluster",
      element_at(ranked(col("cvec")), 1).getField("cluster"))
    val probed = queries
      .withColumn("probe", slice(ranked(col("qvec")), 1, nProbe))
      .select(col("qid"), col("qvec"),
        explode(col("probe.cluster")).as("cluster"))

    // (qid, cid, cos) only — vectors stay in the probe stage; heap
    // top-k, not a per-query sort window (see bruteForceTopK). Each
    // candidate lives in exactly one inverted list, so no dedup needed.
    val scored = probed.join(indexed, Seq("cluster"))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        cosine(col("qvec"), col("cvec")).as("cos"))
    TopK.perGroup(scored, Seq("qid"),
        Seq(col("cos").desc, col("cid")), k, rankName = "rank")
      .select("qid", "cid", "cos", "rank")
  }

  /** IVF probe-width planner: recall@k AND scanned-candidate volume
    * for every nProbe in `grid`, from ONE scored scan — the
    * recall-vs-cost curve the nProbe knob is set from (the IVF
    * sibling of the dim-truncation and LSH-banding planners: measure
    * the operating curve on a slice BEFORE committing the corpus-
    * scale run, never guess it).
    *
    * One pass builds (qid, cid, cos, prank) — prank = the probe
    * position of the candidate's cluster in the query's centroid
    * ranking — and every grid point is then a FILTER over that table
    * exploded through one (n_probe, qid) top-k heap; the cosines are
    * computed once, not once per grid point (the per-grid-scan draft
    * of the dim-truncation planner read 4× the IO — same lesson).
    * Include nCentroids itself in the grid for a built-in recall ≡ 1
    * anchor. Output per n_probe: scanned candidate rows (the cost
    * axis, exact integer) and recall@k in ppm vs the exact ranking
    * (the quality axis).
    */
  def ivfProbeRecallSweep(
      queries: DataFrame, // (qid, qvec)
      candidates: DataFrame, // (cid, cvec)
      centers: Array[Array[Double]],
      k: Int,
      grid: Seq[Int]): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val indexed = candidates.withColumn("cluster",
      element_at(centroidRanked(col("cvec"), centers), 1)
        .getField("cluster"))
    val qprobe = queries
      .select(col("qid"), col("qvec"),
        posexplode(centroidRanked(col("qvec"), centers).getField("cluster")))
      .select(col("qid"), col("qvec"), (col("pos") + 1).as("prank"),
        col("col").as("cluster"))
    // each candidate lives in exactly one list and each query ranks
    // every cluster once ⇒ the cluster join enumerates each (q, c)
    // pair exactly once, with its probe rank attached
    val scored = qprobe.join(indexed, Seq("cluster"))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        cosine(col("qvec"), col("cvec")).as("cos"), col("prank"))
      .localCheckpoint() // feeds exact ranking, sweep, and cost count
    val exact = TopK.perGroup(scored, Seq("qid"),
        Seq(col("cos").desc, col("cid")), k, rankName = "rank")
      .select("qid", "cid")
    val gridDf = broadcast(grid.toDF("n_probe"))
    val swept = scored.join(gridDf, col("prank") <= col("n_probe"))
    val picks = TopK.perGroup(swept, Seq("n_probe", "qid"),
        Seq(col("cos").desc, col("cid")), k, rankName = "rank")
    val nq = queries.count()
    val hits = picks.join(exact, Seq("qid", "cid"))
      .groupBy("n_probe").agg(count(lit(1)).as("h"))
    val scanned = swept.groupBy("n_probe")
      .agg(count(lit(1)).as("scanned_rows"))
    scanned.join(hits, Seq("n_probe"), "left")
      .na.fill(0L, Seq("h"))
      .select(col("n_probe"),
        col("scanned_rows"),
        expr(s"h * 1000000 div ${k * nq}").as("recall_ppm"))
      .orderBy("n_probe")
  }

  // -----------------------------------------------------------------
  // Product quantization (Jégou et al., PAMI 2011): compress each
  // vector to m one-byte codes (argmin sub-codebook entry per
  // dim/m-sized subspace) and rank candidates by Asymmetric Distance
  // — the query stays exact, candidates are scanned as CODES. At
  // 100 TB this is the difference between scanning 256 bytes/vector
  // and scanning m bytes/vector: the ADC pass is a map-only
  // expression over the code table (vectors never shuffle, the
  // codebook is a m×ksub×subdim literal), and the top-k runs on the
  // TopKPerGroup heap. Per-subspace distances are floor-quantized to
  // integer micros before the cross-subspace sum, so the total is an
  // exact integer — partitioning-invariant and replayable in SQL
  // (a raw double sum would be addition-order-dependent).
  // -----------------------------------------------------------------

  /** 1-based inclusive slice of subspace `s` (house: mirrors DuckDB's
    * `v[(s*sub+1):(s*sub+sub)]`). */
  private def subvec(v: Column, s: Int, subdim: Int): Column =
    slice(v, s * subdim + 1, subdim)

  /** PQ code array (m ints): per subspace, the index of the nearest
    * sub-codebook entry — exact-d2 argmin, ties to the smaller index
    * (the `ranked` struct-sort idiom, replayed by ROW_NUMBER d2,j).
    */
  def pqCode(vec: Column, codebooks: Array[Array[Array[Double]]]): Column =
    array(codebooks.zipWithIndex.map { case (ks, s) =>
      element_at(array_sort(array(ks.zipWithIndex.map { case (c, j) =>
        val lits = array(c.map(lit).toSeq: _*)
        struct(
          graft.expressions.VecExpressions.vec_d2(
            subvec(vec, s, c.length), lits).as("d2"),
          lit(j).as("j"))
      }.toSeq: _*)), 1).getField("j")
    }.toSeq: _*)

  /** Asymmetric distance in integer micros: Σ_s floor(10⁶·d2(query
    * subvector, codebook entry the candidate's code names)). Pure
    * map-side column expression — the codebook entry lookup is
    * element_at into a literal array-of-arrays.
    */
  def pqAdcMicros(
      qvec: Column,
      codes: Column,
      codebooks: Array[Array[Array[Double]]]): Column =
    codebooks.zipWithIndex.map { case (ks, s) =>
      val subdim = ks.head.length
      val cbLit = array(ks.map(c => array(c.map(lit).toSeq: _*)).toSeq: _*)
      floor(graft.expressions.VecExpressions.vec_d2(
        subvec(qvec, s, subdim),
        element_at(cbLit, element_at(codes, s + 1) + 1)) * 1e6).cast("long")
    }.reduce(_ + _)

  /** Encode (cid, cvec) → (cid, codes, recon_micros): codes are the
    * per-subspace argmins, recon_micros the quantization error of the
    * vector against its OWN codes (the index-quality diagnostic).
    */
  def pqEncode(
      vecs: DataFrame, // (cid, cvec)
      codebooks: Array[Array[Array[Double]]]): DataFrame =
    vecs
      .withColumn("codes", pqCode(col("cvec"), codebooks))
      .withColumn("recon_micros",
        pqAdcMicros(col("cvec"), col("codes"), codebooks))
      .select("cid", "codes", "recon_micros")

  /** ADC top-k: rank every candidate's CODES against each exact query
    * vector (asymmetric: only candidates are quantized). Queries
    * broadcast; the code table streams map-side; heap top-k. */
  def pqAdcTopK(
      queries: DataFrame, // (qid, qvec)
      codes: DataFrame, // (cid, codes)
      codebooks: Array[Array[Array[Double]]],
      k: Int): DataFrame = {
    val scored = codes.crossJoin(broadcast(queries))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        pqAdcMicros(col("qvec"), col("codes"), codebooks).as("ad2_micros"))
    TopK.perGroup(scored, Seq("qid"),
        Seq(col("ad2_micros").asc, col("cid")), k, rankName = "rank")
      .select("qid", "cid", "ad2_micros", "rank")
  }

  /** Two-stage PQ search — the production shape: ADC over codes
    * narrows each query to a `shortlist` of candidates (vectors never
    * touched), then ONLY those |Q|·shortlist rows join their exact
    * vectors back for a true-L2 re-rank. Raw ADC ranking saturates at
    * the quantizer's resolution (measured 0.2–0.6 recall@5 here);
    * the re-rank recovers 0.9+ while still never scanning full
    * vectors corpus-wide — the same narrow-then-exact composition as
    * projectedTopK (q_e_ann_rp).
    */
  def pqAdcRerankTopK(
      queries: DataFrame, // (qid, qvec)
      candidates: DataFrame, // (cid, cvec)
      codes: DataFrame, // (cid, codes)
      codebooks: Array[Array[Array[Double]]],
      k: Int,
      shortlist: Int): DataFrame = {
    val narrowed = pqAdcTopK(queries, codes, codebooks, shortlist)
      .select("qid", "cid")
    val scored = narrowed
      .join(candidates, "cid")
      .join(broadcast(queries), "qid")
      .select(col("qid"), col("cid"),
        graft.expressions.VecExpressions.vec_d2(col("qvec"), col("cvec"))
          .as("d2"))
    TopK.perGroup(scored, Seq("qid"),
        Seq(col("d2").asc, col("cid")), k, rankName = "rank")
      .select("qid", "cid", "d2", "rank")
  }

  /** Deterministic codebooks from an explicit ksub-row table (the
    * oracle-replayable quantizer: row j's subspace-s slice is entry
    * (s, j) — the PQ analogue of q_e_ivf's vec_id<16 centroid table).
    */
  def pqCodebooksFromRows(
      rows: Array[Array[Double]], m: Int): Array[Array[Array[Double]]] = {
    val dim = rows.head.length
    require(dim % m == 0, s"pq: dim $dim not divisible by m=$m")
    val subdim = dim / m
    Array.tabulate(m)(s => rows.map(_.slice(s * subdim, (s + 1) * subdim)))
  }

  /** Driver-side nearest-center assignment — the scalar twin of
    * centroidRanked (index-ordered d2 fold, strict < keeps the first
    * ⇒ ties to the smaller index), for building residual codebook
    * rows from a handful of collected vectors.
    */
  def nearestCenter(x: Array[Double], centers: Array[Array[Double]]): Int = {
    var best = 0; var bd = Double.MaxValue
    var c = 0
    while (c < centers.length) {
      var s = 0.0; var i = 0
      while (i < x.length) {
        val t = x(i) - centers(c)(i); s += t * t; i += 1
      }
      if (s < bd) { bd = s; best = c }
      c += 1
    }
    best
  }

  /** Production codebook training: per-subspace Lloyd's on a bounded
    * driver-side sample (like ivfTopK's coarse quantizer — the model
    * is m·ksub·subdim doubles regardless of corpus size). Recall is
    * spec-gated (SimilaritySpec); the catalog entry pins
    * pqCodebooksFromRows for cross-engine exactness instead.
    */
  def pqTrain(
      candidates: DataFrame, // (cid, cvec)
      m: Int,
      ksub: Int = 16,
      seed: Long = 42L,
      maxIter: Int = 8,
      maxTrainRows: Int = 4096): Array[Array[Array[Double]]] = {
    val sampled = candidates
      .select(col("cvec").cast("array<double>"))
      .limit(maxTrainRows).collect()
      .map(_.getSeq[Double](0).toArray)
    val dim = sampled.head.length
    require(dim % m == 0, s"pq: dim $dim not divisible by m=$m")
    val subdim = dim / m
    Array.tabulate(m) { s =>
      lloyd(sampled.map(_.slice(s * subdim, (s + 1) * subdim)),
        ksub, maxIter, seed + s)
    }
  }

  // -----------------------------------------------------------------
  // IVF-ADC (Jégou et al., PAMI 2011 §V — the FAISS "IVFx,PQy"
  // composition): coarse-quantize candidates into inverted lists and
  // PQ-encode the RESIDUAL (vector − its centroid), so at query time
  // only the nProbe probed lists are scanned, and scanned as CODES —
  // the two scale levers multiplied: IVF cuts the candidate count
  // nlist/nProbe-fold, PQ cuts the bytes-per-candidate 32-fold.
  // Residual encoding is what makes the shared codebook tight: after
  // subtracting the centroid every list's vectors live in the same
  // origin-centered ball. At 100 TB this is THE published
  // billion-scale layout; the index build is one map-only pass and
  // the query scan's single shuffle is the probe join on cluster id.
  // -----------------------------------------------------------------

  /** Element-wise residual against the assigned centroid: vec −
    * centers[cluster]. Plain IEEE double subtraction per dimension —
    * the oracle replays it as `e[i+1] − ce[i+1]` over the same
    * parquet doubles, so residuals are bit-identical cross-engine.
    */
  def centroidResidual(
      vec: Column, cluster: Column, centers: Array[Array[Double]]): Column = {
    val centLit = array(centers.map(c => array(c.map(lit).toSeq: _*)).toSeq: _*)
    zip_with(vec.cast("array<double>"), element_at(centLit, cluster + 1),
      (a, b) => a - b)
  }

  /** Build the IVF-ADC index: (cid, cluster, codes). Assignment and
    * residual-encode are both pure column expressions over literal
    * tables (no shuffle at all — at 100 TB this pass is the one that
    * turns the 256-byte vector column into 1 cluster id + m bytes).
    */
  def ivfPqEncode(
      candidates: DataFrame, // (cid, cvec)
      centers: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]]): DataFrame =
    candidates
      .withColumn("cluster",
        element_at(centroidRanked(col("cvec"), centers), 1)
          .getField("cluster"))
      // rvec as its OWN projection: the m·ksub argmin terms in pqCode
      // each reference the residual, and inlining the zip_with into
      // all of them re-evaluates it m·ksub× per row (measured 6×
      // slower); CollapseProject keeps a non-cheap multiply-referenced
      // alias as a separate projection, so this evaluates once.
      .withColumn("rvec",
        centroidResidual(col("cvec"), col("cluster"), centers))
      .withColumn("codes", pqCode(col("rvec"), codebooks))
      .select("cid", "cluster", "codes")

  /** IVF-ADC top-k: each query probes its nProbe nearest lists; within
    * a probed list the QUERY's residual against THAT list's centroid
    * scores every member's codes by asymmetric distance (integer
    * micros — see pqAdcMicros). Each candidate lives in exactly one
    * list, so probe hits need no dedup; the top-k runs on the
    * TopKPerGroup heap. Distances are comparable across probed lists
    * because ‖q − c‖² = ‖(q − μℓ) − (c − μℓ)‖² for the shared μℓ —
    * the residual trick changes the codebook's frame, not the metric.
    */
  def ivfPqTopK(
      queries: DataFrame, // (qid, qvec)
      index: DataFrame, // (cid, cluster, codes) from ivfPqEncode
      centers: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]],
      nProbe: Int,
      k: Int): DataFrame = {
    val probed = queries
      .withColumn("probe",
        slice(centroidRanked(col("qvec"), centers), 1, nProbe))
      .select(col("qid"), col("qvec"),
        explode(col("probe.cluster")).as("cluster"))
      .select(col("qid"), col("cluster"),
        centroidResidual(col("qvec"), col("cluster"), centers).as("qres"))
    val scored = probed.join(index, Seq("cluster"))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        pqAdcMicros(col("qres"), col("codes"), codebooks).as("ad2_micros"))
    TopK.perGroup(scored, Seq("qid"),
        Seq(col("ad2_micros").asc, col("cid")), k, rankName = "rank")
      .select("qid", "cid", "ad2_micros", "rank")
  }

  /** Two-stage IVF-ADC search (IVFADC-R, Jégou et al. §V.D): the
    * probed-list code scan narrows each query to a shortlist, then
    * ONLY those |Q|·shortlist rows join their exact vectors for a
    * true-L2 re-rank — the same narrow-then-exact composition as
    * pqAdcRerankTopK, now on top of the inverted lists, so the
    * corpus-wide scan is BOTH list-pruned and code-only. The recall
    * ceiling of raw residual-ADC (quantizer resolution) lifts to
    * near-exact within the probed lists at the cost of moving
    * |Q|·shortlist full vectors.
    */
  def ivfPqRerankTopK(
      queries: DataFrame, // (qid, qvec)
      candidates: DataFrame, // (cid, cvec)
      index: DataFrame, // (cid, cluster, codes) from ivfPqEncode
      centers: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]],
      nProbe: Int,
      k: Int,
      shortlist: Int): DataFrame = {
    val narrowed =
      ivfPqTopK(queries, index, centers, codebooks, nProbe, shortlist)
        .select("qid", "cid")
    val scored = narrowed
      .join(candidates, "cid")
      .join(broadcast(queries), "qid")
      .select(col("qid"), col("cid"),
        graft.expressions.VecExpressions.vec_d2(col("qvec"), col("cvec"))
          .as("d2"))
    TopK.perGroup(scored, Seq("qid"),
        Seq(col("d2").asc, col("cid")), k, rankName = "rank")
      .select("qid", "cid", "d2", "rank")
  }

  /** Plain Lloyd's k-means over a driver-held sample (deterministic:
    * seeded init, fixed iteration count; empty clusters keep their
    * previous center).
    */
  private def lloyd(
      xs: Array[Array[Double]],
      k: Int,
      iters: Int,
      seed: Long): Array[Array[Double]] = {
    require(xs.nonEmpty, "ivf: empty training sample")
    val rnd = new scala.util.Random(seed)
    val dim = xs.head.length
    var centers = Array.fill(k)(xs(rnd.nextInt(xs.length)).clone())
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < dim) { val t = a(i) - b(i); s += t * t; i += 1 }
      s
    }
    for (_ <- 0 until iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Int](k)
      xs.foreach { x =>
        var best = 0; var bd = Double.MaxValue
        var c = 0
        while (c < k) {
          val dd = d2(x, centers(c)); if (dd < bd) { bd = dd; best = c }
          c += 1
        }
        counts(best) += 1
        val s = sums(best); var i = 0
        while (i < dim) { s(i) += x(i); i += 1 }
      }
      centers = Array.tabulate(k)(c =>
        if (counts(c) > 0) sums(c).map(_ / counts(c)) else centers(c))
    }
    centers
  }

  /** Embedding-cosine near-duplicate pairs above a threshold, via LSH
    * buckets (never all-pairs): pairs surface only when bucketed
    * together. Candidate generation runs through the same capped
    * bucket self-join as every other pair generator in the repo
    * (Dedup.bandCandidatePairs): buckets with ≤ `maxBucket` members
    * go all-pairs; hotter buckets degrade to STAR pairing around the
    * bucket's min-id representative — O(F) candidates instead of F².
    * That cap is load-bearing exactly here: a correlated embedding
    * corpus (the near-dup workload) concentrates mass in few buckets,
    * and an uncapped self-join on one hot bucket is the F² job that
    * kills the run at scale. Only (id, bucket) rides the candidate
    * shuffle — vectors join back per surviving pair side.
    */
  def cosineNearDups(
      vecs: DataFrame, // (id, vec)
      dim: Int,
      minCosine: Double,
      bits: Int = 10,
      seed: Long = 42L,
      maxBucket: Int = Dedup.DefaultMaxBucket): DataFrame = {
    val b = vecs.select(col("id"),
      lshBucket(col("vec"), dim, bits, seed).as("bk"))
    Dedup.bandCandidatePairs(b, maxBucket)
      .join(vecs.select(col("id").as("id_a"), col("vec").as("va")), Seq("id_a"))
      .join(vecs.select(col("id").as("id_b"), col("vec").as("vb")), Seq("id_b"))
      .withColumn("cos", cosine(col("va"), col("vb")))
      .filter(col("cos") >= minCosine)
      .select("id_a", "id_b", "cos")
  }

  /** Cross-corpus embedding near-dup — the vector-space face of
    * Dedup.crossCorpusNearDups: the arrival batch's embeddings dedup
    * against the training corpus's, candidates generated only across
    * sides (both sides bucket with the SAME seeded hyperplanes, so a
    * pair lands together regardless of which corpus it arrives in),
    * capped by the shared total-occupancy cool/two-star rule, then
    * exact-cosine verified. Semantic near-dups (paraphrase-level) are
    * exactly the class MinHash text dedup misses cross-corpus.
    */
  def crossCorpusCosineNearDups(
      vecsA: DataFrame, // (id, vec)
      vecsB: DataFrame, // (id, vec)
      dim: Int,
      minCosine: Double,
      bits: Int = 10,
      seed: Long = 42L,
      maxBucket: Int = Dedup.DefaultMaxBucket): DataFrame = {
    def banded(v: DataFrame) = v.select(col("id"),
      lshBucket(col("vec"), dim, bits, seed).as("bk"))
    Dedup.crossBandCandidatePairs(banded(vecsA), banded(vecsB), maxBucket)
      .join(vecsA.select(col("id").as("id_a"), col("vec").as("va")), Seq("id_a"))
      .join(vecsB.select(col("id").as("id_b"), col("vec").as("vb")), Seq("id_b"))
      .withColumn("cos", cosine(col("va"), col("vb")))
      .filter(col("cos") >= minCosine)
      .select("id_a", "id_b", "cos")
  }

  /** Per-cluster representatives — the semantic-diversity-sampling
    * primitive (pick the k most CENTRAL members of every embedding
    * cluster; the union is a cluster-stratified subsample of the
    * corpus, the standard recipe for diversity-preserving data
    * selection). Assignment to the nearest centroid is map-side only
    * (centroids are literals, same fused vec_d2 ranking as
    * [[ivfTopKWithCenters]]); the k-closest-per-cluster runs on the
    * TopKPerGroup heap plan, so the single shuffle carries just
    * (cluster, cid, d2) — vectors never ride it. Output:
    * (cluster, cid, d2, rank).
    */
  def clusterRepresentatives(
      vecs: DataFrame, // (cid, cvec)
      centers: Array[Array[Double]],
      k: Int): DataFrame = {
    TopK.perGroup(
        assignNearest(vecs, centers).select("cid", "cluster", "d2"),
        Seq("cluster"), Seq(col("d2"), col("cid")), k, rankName = "rank")
      .select("cluster", "cid", "d2", "rank")
  }

  /** Map-side nearest-centroid assignment against a literal centroid
    * table: (cid, cluster, d2, cvec). No shuffle — the centroid table
    * is inlined into the plan as literals (at 100 TB the model is tiny
    * even for thousands of centroids), so assignment streams inside
    * whole-stage codegen over the scan. Tie-break: (d2, cluster) min.
    */
  def assignNearest(vecs: DataFrame, centers: Array[Array[Double]])
      : DataFrame = {
    def best(vec: Column): Column =
      element_at(array_sort(array(centers.zipWithIndex.map { case (c, i) =>
        val lits = array(c.map(lit).toSeq: _*)
        struct(graft.expressions.VecExpressions.vec_d2(vec, lits).as("d2"),
          lit(i).as("cluster"))
      }.toSeq: _*)), 1)
    vecs.withColumn("b", best(col("cvec")))
      .select(col("cid"), col("b.cluster").as("cluster"),
        col("b.d2").as("d2"), col("cvec"))
  }

  /** SemDeDup (Abbas et al. '23, arXiv:2303.09540): semantic
    * deduplication by clustering then within-cluster cosine pruning —
    * the dedup that catches PARAPHRASES, which no text-shingle method
    * can. A member is dropped iff its cluster pairs it with a
    * SMALLER-id member at cosine ≥ `minCosine` (min-id survivor, the
    * same deterministic rule as exactDedup); survivors return as
    * (cid, cluster).
    *
    * Pairing is exactly the house candidate generator
    * (Dedup.bandCandidatePairs) with the CLUSTER as the bucket: cool
    * clusters compare all-pairs, clusters past `maxCluster` degrade
    * to the min-id star — for dedup that star IS SemDeDup's published
    * design (compare members to a cluster exemplar), so the cap
    * costs nothing semantically while hard-bounding the quadratic.
    *
    * Scale: assignment is map-side against literal centroids (pick k
    * so n/k bounds the cool-cluster quadratic; the cap backstops
    * skew); only (id, cluster) rides the candidate shuffle, vectors
    * join back per surviving pair side; the drop set is
    * |near-dup members| rows, anti-joined unhinted so AQE broadcasts
    * it when it fits.
    */
  def semanticDedup(
      vecs: DataFrame, // (cid, cvec)
      centers: Array[Array[Double]],
      minCosine: Double,
      maxCluster: Int = Dedup.DefaultMaxBucket): DataFrame = {
    val assigned = assignNearest(vecs, centers)
    val pairs = Dedup.bandCandidatePairs(
      assigned.select(col("cid").as("id"), col("cluster").as("bk")),
      maxCluster)
    val dropped = pairs
      .join(vecs.select(col("cid").as("id_a"), col("cvec").as("va")),
        Seq("id_a"))
      .join(vecs.select(col("cid").as("id_b"), col("cvec").as("vb")),
        Seq("id_b"))
      .filter(cosine(col("va"), col("vb")) >= minCosine)
      .select(col("id_b").as("cid")).distinct()
    assigned.select("cid", "cluster").join(dropped, Seq("cid"), "left_anti")
  }

  /** One full k-means update step: map-side assignment to the nearest
    * literal centroid, then the micros-deterministic per-cluster mean
    * ([[groupCentroids]]). Returns (cluster, centroid, n) — the new
    * model. The Lloyd's-iteration driver loop is: collect this tiny
    * result, re-inline as literals, repeat; only the model (k·dim
    * doubles) ever reaches the driver.
    */
  def kmeansStep(vecs: DataFrame, centers: Array[Array[Double]])
      : DataFrame =
    groupCentroids(
      assignNearest(vecs, centers).select(col("cluster"), col("cvec")),
      "cluster", "cvec")

  /** [[kmeansStep]] in the flat (cluster, pos, cm, n) rendering of
    * [[groupCentroidMicros]] — the scalar-column shape the driver's
    * comparator can hash (an array-typed result column crashes its
    * pandas sort; CORRECTNESS_r08 q_e_kmeans_step).
    */
  def kmeansStepMicros(vecs: DataFrame, centers: Array[Array[Double]])
      : DataFrame =
    groupCentroidMicros(
      assignNearest(vecs, centers).select(col("cluster"), col("cvec")),
      "cluster", "cvec")

  /** Deterministic farthest-point (maxmin) seeding — the k-means++
    * idea with the D²-sampling randomness replaced by the exact
    * argmax (Gonzalez '85): seed 1 is the min-id point; each next
    * seed is the point FARTHEST from the chosen set (micros-floored
    * d2, ties to the smaller id — total order, replayable anywhere).
    * Spread-out seeds are what keeps Lloyd's from collapsing clusters
    * onto one dense region.
    *
    * k driver rounds, each one map-side [[assignNearest]] against the
    * literal chosen set + a 1-row TakeOrdered argmax — the collect is
    * one row per round (the house bounded-collect exception), the
    * corpus never moves. floor commutes with min, so the micros
    * min-distance equals the floor of the exact min — the oracle
    * LEAST-chains per-seed floors and matches exactly.
    *
    * Returns (rank, cid, d2m): the chosen seeds in pick order with
    * their min-distance-to-prior-set in micros (0 for the first).
    */
  def farthestPointSeeds(vecs: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = vecs.sparkSession
    import spark.implicits._
    val first = vecs.orderBy("cid").limit(1)
      .select(col("cid"), col("cvec").cast("array<double>")).collect()(0)
    var chosen = List((1, first.getLong(0), 0L))
    var centers = Array(first.getSeq[Double](1).toArray)
    for (r <- 2 to k) {
      // exclude already-chosen ids: with exact-duplicate vectors every
      // remaining distance can be 0 and the bare argmax would re-pick
      // a chosen cid (k literals — cheap at any scale)
      val best = assignNearest(vecs, centers)
        .filter(!col("cid").isin(chosen.map(_._2): _*))
        .select(col("cid"), floor(col("d2") * 1e6).cast("long").as("d2m"),
          col("cvec").cast("array<double>").as("cvec"))
        .orderBy(desc("d2m"), asc("cid")).limit(1).collect()(0)
      chosen ::= ((r, best.getLong(0), best.getLong(1)))
      centers = centers :+ best.getSeq[Double](2).toArray
    }
    chosen.reverse.toDF("rank", "cid", "d2m")
  }

  /** Per-cluster inertia (within-cluster sum of squared distances) of
    * a model — THE k-selection / convergence metric (elbow method;
    * Lloyd's stops when inertia stops falling). Map-side assignment,
    * then each member's exact-fold d2 fixed-points to MICROS and sums
    * as a long — a cross-row double sum would be partition-order-
    * dependent; the micros sum is exact and replayable. Returns
    * (cluster, n, inertia_micros); one dim-free partial-agg shuffle.
    */
  def kmeansInertia(vecs: DataFrame, centers: Array[Array[Double]])
      : DataFrame =
    assignNearest(vecs, centers)
      .select(col("cluster"), floor(col("d2") * 1e6).cast("long").as("d2m"))
      .groupBy("cluster")
      .agg(count(lit(1)).as("n"), sum("d2m").as("inertia_micros"))

  /** Lloyd's k-means: `iters` [[kmeansStep]] rounds from the seed
    * model. Between rounds only the k·dim model crosses to the driver
    * (a bounded k-row collect, the house exception) and re-inlines as
    * plan literals — the corpus never leaves the executors and is
    * never cached; every round costs one map-side assignment plus the
    * two dim-sized partial-agg shuffles of [[groupCentroids]].
    *
    * Determinism: each round's centroids are micro-precision floor
    * divisions of exact long sums ([[groupCentroids]]) and the
    * collect→literal round-trip is exact double, so the whole
    * iteration chain is partition-order-free and replayable — the
    * oracle unrolls it CTE-per-round and matches bit-for-bit.
    *
    * A cluster that loses all members KEEPS its previous centroid
    * (deterministic, the standard practical choice — ids stay stable,
    * the model never shrinks mid-run); a cluster empty in the FINAL
    * assignment is absent from the returned model, matching
    * [[kmeansStep]]'s contract. Returns (cluster, centroid, n).
    */
  def kmeans(vecs: DataFrame, seeds: Array[Array[Double]], iters: Int)
      : DataFrame =
    kmeansStep(vecs, lloydCenters(vecs, seeds, iters))

  /** [[kmeans]] with the final model in the flat (cluster, pos, cm, n)
    * rendering of [[groupCentroidMicros]] — same iteration chain, same
    * fixed points, scalar output columns (driver-comparator-hashable).
    */
  def kmeansMicros(vecs: DataFrame, seeds: Array[Array[Double]], iters: Int)
      : DataFrame =
    kmeansStepMicros(vecs, lloydCenters(vecs, seeds, iters))

  /** The Lloyd's driver loop shared by [[kmeans]] / [[kmeansMicros]]:
    * iters−1 collect-and-reinline rounds (only the k·dim model crosses
    * to the driver), returning the centers the FINAL step runs from.
    */
  private def lloydCenters(vecs: DataFrame, seeds: Array[Array[Double]],
      iters: Int): Array[Array[Double]] = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(seeds.nonEmpty, "seeds must be non-empty")
    var centers = seeds
    for (_ <- 1 until iters) {
      val model = kmeansStep(vecs, centers)
        .select("cluster", "centroid").collect()
      val upd = model.map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
        .toMap
      centers = Array.tabulate(centers.length)(i => upd.getOrElse(i, centers(i)))
    }
    centers
  }

  /** Per-group element-wise mean embedding (the vector-aggregation
    * primitive behind class centroids, topic prototypes, and k-means
    * update steps). Returns (keyCol, centroid: array<double> at micro
    * precision, n members).
    *
    * Determinism: a cross-row float mean is summation-order-dependent,
    * so elements are fixed-pointed to integer MICROS (float→double is
    * exact, ×1e6 and floor are IEEE-deterministic) and summed as
    * longs — partition-order-free, replayable in any engine. The mean
    * itself is a FLOOR integer division in micros (never a float
    * `round`, whose half-way ulps differ across engines); the single
    * final /1e6 of a small exact integer is identical IEEE in any
    * engine. Long capacity: |x|≤10³ ⇒ 10⁹ micros/row ⇒ safe past 10⁹
    * rows/group. Contract: vectors in one group must share a length
    * (fixed-dim embedding columns) — ragged inputs would mean per-pos
    * member counts and a centroid that is no single vector's shape.
    *
    * Scale: posexplode looks like a dim× blowup, but groupBy(key, pos)
    * partially aggregates map-side — each task ships only
    * |groups|·dim partial sums, and the second groupBy(key) ships dim
    * rows per group. No vector ever crosses the wire twice.
    */
  def groupCentroids(df: DataFrame, keyCol: String, vecCol: String)
      : DataFrame =
    groupCentroidMicros(df, keyCol, vecCol)
      .groupBy(keyCol)
      .agg(
        transform(
          array_sort(collect_list(struct(col("pos"), col("cm")))),
          s => s.getField("cm").cast("double") / lit(1e6)).as("centroid"),
        max("n").as("n"))

  /** The per-position micros core of [[groupCentroids]]: one row per
    * (key, pos) with the floor-divided mean element `cm` in integer
    * micros and the member count `n` — all the arithmetic, none of the
    * array reassembly. This flat rendering is also the catalog-query
    * output shape: every column is a scalar the driver's comparator
    * can sort and hash (an `array<double>` result column crashes its
    * pandas canonicalization — CORRECTNESS_r08 q_e_centroids).
    */
  def groupCentroidMicros(df: DataFrame, keyCol: String, vecCol: String)
      : DataFrame = {
    val e = df.select(col(keyCol),
        posexplode(col(vecCol)).as(Seq("pos", "x")))
      .select(col(keyCol), col("pos"),
        floor(col("x").cast("double") * 1e6).cast("long").as("xm"))
    e.groupBy(keyCol, "pos")
      .agg(sum("xm").as("sm"), count(lit(1)).as("n"))
      // floorDiv(sm, n) in exact integer arithmetic: subtract the
      // nonneg pmod so the numerator divides exactly — `div` then has
      // nothing to truncate (safe past 2^53 where a double floor isn't)
      .withColumn("cm", expr("(sm - ((sm % n) + n) % n) div n"))
      .select(col(keyCol), col("pos"), col("cm"), col("n"))
  }

  /** Hard-negative mining for contrastive training: per anchor, the
    * k MOST similar candidates of a DIFFERENT class — the negatives
    * that actually move an embedding model (random negatives are
    * trivially separable; InfoNCE-family training lives on these).
    * Same scale shape as [[bruteForceTopK]] (anchors broadcast,
    * candidates stream map-side, heap top-k) with the class-exclusion
    * predicate applied BEFORE the heap, so same-class pairs never
    * occupy heap slots; swap the scored scan for the LSH/IVF variants
    * at larger anchor counts.
    */
  def hardNegativesTopK(
      anchors: DataFrame, // (qid, qvec, qlabel)
      candidates: DataFrame, // (cid, cvec, clabel)
      k: Int): DataFrame = {
    val scored = candidates.crossJoin(broadcast(anchors))
      .filter(col("qid") =!= col("cid") && col("qlabel") =!= col("clabel"))
      .select(col("qid"), col("cid"),
        cosine(col("qvec"), col("cvec")).as("cos"))
    TopK.perGroup(scored, Seq("qid"),
        Seq(col("cos").desc, col("cid")), k, rankName = "rank")
      .select("qid", "cid", "cos", "rank")
  }

  /** Mean pairwise cosine per group WITHOUT pairs — the moment
    * identity: for unit vectors, Σ_{i≠j} v̂ᵢ·v̂ⱼ = ‖Σ v̂‖² − Σ‖v̂‖².
    * The per-pair work that makes naive diversity O(n²·dim) folds to
    * ONE corpus scan producing dim longs per group (the centroid
    * moment) — at 100 TB the whole "how self-similar is this source"
    * question costs one map-side-combined agg. Rows normalize and
    * floor-quantize to micros (the pinned IEEE chain ÷norm, ×10⁶,
    * floor — zero-norm rows quantize to 0), and EVERYTHING after is
    * exact integer: per-(group, pos) long sums, decimal squares, the
    * pmod-floor division — order-free, partitioning-invariant,
    * SQL-replayable. Output is mean pairwise cosine in ppm of the
    * quantized unit vectors (within one micro-quantization ulp of
    * the float answer; the ESTIMATOR, not a float mean, is the
    * contract). Groups of one row report NULL (no pairs).
    */
  def meanPairwiseCosine(
      df: DataFrame, keyCol: String, vecCol: String): DataFrame =
    meanPairwiseCosineFromSums(diversityPosSums(df, keyCol, vecCol), keyCol)

  /** The order-free sufficient statistics of [[meanPairwiseCosine]]:
    * per (key, pos), the exact long sum of micros-quantized unit-
    * vector components, plus the row count and Σ‖·‖² diagonal carried
    * through pos 0. Pure sums ⇒ valid as an incremental STREAMING
    * aggregation (state: dim rows per key), maintained exactly
    * regardless of micro-batch boundaries — the streaming face
    * (streaming/StreamDiversity) shares this verbatim.
    */
  def diversityPosSums(
      df: DataFrame, keyCol: String, vecCol: String): DataFrame = {
    val base = df
      .select(col(keyCol), col(vecCol).cast("array<double>").as("ev"))
      // nrm as its OWN projection — inlining the fold into the
      // per-element transform would re-evaluate it dim× per row
      .withColumn("nrm",
        sqrt(graft.expressions.VecExpressions.vec_dot(col("ev"), col("ev"))))
      .withColumn("qarr", transform(col("ev"), x =>
        when(col("nrm") > 0, floor(x / col("nrm") * lit(1e6)).cast("long"))
          .otherwise(lit(0L))))
      // Σᵢ qᵢ² per row: ≤ dim·10¹² — safely long
      .withColumn("diag",
        aggregate(col("qarr"), lit(0L), (a, v) => a + v * v))
    base
      .select(col(keyCol), col("diag"),
        posexplode(col("qarr")).as(Seq("pos", "qi")))
      // carry the row-diagonal through pos 0 only, so the key-level
      // re-agg never double-counts it and the corpus is scanned ONCE
      .withColumn("diag0", when(col("pos") === 0, col("diag")).otherwise(lit(0L)))
      .groupBy(col(keyCol), col("pos"))
      .agg(sum("qi").as("s"), sum("diag0").as("d0"),
        sum(when(col("pos") === 0, 1L).otherwise(0L)).as("n0"))
  }

  /** Finish [[diversityPosSums]] state to (key, n, mean_cos_ppm) —
    * shared by the batch operator and the drained streaming state,
    * so batch ≡ streaming is an identity of the same arithmetic.
    */
  def meanPairwiseCosineFromSums(
      sums: DataFrame, keyCol: String): DataFrame =
    sums
      .groupBy(keyCol)
      .agg(
        sum(col("s").cast("decimal(38,0)") * col("s")).as("s2"),
        sum("d0").cast("decimal(38,0)").as("dd"),
        max("n0").as("n"))
      // the pair-count denominator in decimal BEFORE multiplying:
      // n(n−1)·10⁶ passes the long bound at n ≈ 3·10⁶ — real at scale
      .withColumn("den",
        col("n").cast("decimal(38,0)")
          * (col("n").cast("decimal(38,0)") - 1) * lit(1000000))
      .select(col(keyCol), col("n"),
        // floor((s2 − dd) / (n(n−1)·10⁶)) via the exact pmod trick
        // (truncate ≡ floor once the numerator divides exactly);
        // n = 1 ⇒ no pairs ⇒ NULL
        when(col("n") > 1, expr(
          "(s2 - dd - (((s2 - dd) % den + den) % den)) div den"))
          .cast("long").as("mean_cos_ppm"))

  /** Greedy MMR (maximal marginal relevance, Carbonell & Goldstein
    * SIGIR'98) diverse subset selection at λ = ½: round r picks the
    * candidate maximizing rel − max_{s∈selected} sim(·, s) (the λ=½
    * argmax with the constant ½ dropped — exact integer micros, ties
    * to the smaller cid; round 1 is pure argmax rel). Greedy MMR is
    * inherently sequential in k, so the operator runs k driver
    * rounds — but each round is ONE map-only scan plus a global
    * top-1 (TakeOrdered, a 1-row reduction): the selected set is
    * k·dim doubles of driver metadata, never a shuffle. At 100 TB
    * picking k diverse exemplars costs k scans of the (cid, vec)
    * projection and nothing else. Output: (round, cid, rel_micros,
    * maxsim_micros, score_micros) — k rows.
    */
  def mmrSelect(
      candidates: DataFrame, // (cid, cvec)
      query: Array[Double],
      k: Int): DataFrame = {
    val spark = candidates.sparkSession
    val qLit = array(query.map(lit).toIndexedSeq: _*)
    val base = candidates
      .select(col("cid"), col("cvec").cast("array<double>").as("cv"))
      .withColumn("rel_micros",
        floor(graft.expressions.VecExpressions.vec_cosine(col("cv"), qLit)
          * 1e6).cast("long"))
      .localCheckpoint() // scanned k times; rel computed once
    val picked = scala.collection.mutable.ArrayBuffer
      .empty[(Int, Long, Long, Option[Long], Long)]
    val selVecs = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    for (round <- 1 to k) {
      val remaining =
        if (picked.isEmpty) base
        else base.filter(!col("cid").isin(picked.map(_._2).toSeq: _*))
      val scored =
        if (selVecs.isEmpty)
          remaining.withColumn("maxsim_micros", lit(null).cast("long"))
            .withColumn("score_micros", col("rel_micros"))
        else {
          val sims = selVecs.map { s =>
            val sLit = array(s.map(lit).toIndexedSeq: _*)
            floor(graft.expressions.VecExpressions.vec_cosine(col("cv"), sLit)
              * 1e6).cast("long")
          }
          val maxsim =
            if (sims.length == 1) sims.head else greatest(sims.toSeq: _*)
          remaining.withColumn("maxsim_micros", maxsim)
            .withColumn("score_micros", col("rel_micros") - col("maxsim_micros"))
        }
      val top = scored
        .orderBy(col("score_micros").desc, col("cid"))
        .limit(1)
        .select("cid", "cv", "rel_micros", "maxsim_micros", "score_micros")
        .collect().head
      picked += ((round, top.getLong(0), top.getLong(2),
        if (top.isNullAt(3)) None else Some(top.getLong(3)), top.getLong(4)))
      selVecs += top.getSeq[Double](1).toArray
    }
    import spark.implicits._
    picked.toSeq
      .map { case (r, c, rel, ms, sc) => (r, c, rel, ms, sc) }
      .toDF("round", "cid", "rel_micros", "maxsim_micros", "score_micros")
  }

  // ---------------------------------------------------------------
  // SQ8 scalar quantization — the storage tier UNDER product
  // quantization: one uint8 code per dimension (4× smaller than
  // float32, no codebook training), scored by exact INTEGER dot
  // products of the codes. The standard first rung of the vector-
  // storage ladder (FAISS's SQ8 / "int8 embeddings"): cheap to build
  // (two scans: one min/max agg, one map-only encode), decent recall,
  // and the scored scan reads 64 bytes/vector instead of 256.
  // ---------------------------------------------------------------

  /** Per-dimension (min, max) over the corpus — the SQ8 "training"
    * in one map-side-combined agg; output is dim rows of metadata
    * (collected: dim ≤ a few thousand, same contract as the centroid
    * collects above).
    */
  def sq8MinMax(vecs: DataFrame, vecCol: String): (Array[Double], Array[Double]) = {
    val stats = vecs
      .select(posexplode(col(vecCol).cast("array<double>"))
        .as(Seq("pos", "x")))
      .groupBy("pos").agg(min("x").as("mn"), max("x").as("mx"))
      .orderBy("pos")
      .collect()
    (stats.map(_.getDouble(1)), stats.map(_.getDouble(2)))
  }

  /** SQ8 codes (array<long>, each in [0,255]): per dim,
    * floor((x−mn)·255 / (mx−mn)); a constant dimension (mx=mn) codes
    * to 0. No clamp needed: for x ∈ [mn,mx] the quotient is within
    * one float ulp of [0,255], so the floor lands in range. The op
    * ORDER (subtract, ×255, divide, floor) is part of the contract —
    * the oracle spells the identical IEEE chain.
    */
  def sq8Code(vec: Column, mins: Array[Double], maxs: Array[Double]): Column = {
    val mnLit = array(mins.map(lit).toIndexedSeq: _*)
    val mxLit = array(maxs.map(lit).toIndexedSeq: _*)
    transform(vec.cast("array<double>"), (x, i) => {
      val mn = element_at(mnLit, i + 1)
      val mx = element_at(mxLit, i + 1)
      when(mx > mn, floor((x - mn) * lit(255.0) / (mx - mn)).cast("long"))
        .otherwise(lit(0L))
    })
  }

  /** SQ8 top-k: rank candidates per query by the exact integer dot
    * product of their codes (ties to the smaller cid). Queries
    * broadcast; candidates stream map-side carrying only their 8-bit
    * codes — the whole scored scan is integer arithmetic inside
    * whole-stage codegen, and at 100 TB it reads the code column,
    * never the float vectors. Max score 64·255² ≈ 4.2e6: a long
    * holds dims past 10¹⁰.
    */
  def sq8TopK(
      queries: DataFrame, // (qid, qvec)
      candidates: DataFrame, // (cid, cvec)
      mins: Array[Double], maxs: Array[Double], k: Int): DataFrame = {
    val qc = queries.select(col("qid"),
      sq8Code(col("qvec"), mins, maxs).as("qcodes"))
    val cc = candidates.select(col("cid"),
      sq8Code(col("cvec"), mins, maxs).as("ccodes"))
    val scored = cc.crossJoin(broadcast(qc))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        aggregate(zip_with(col("qcodes"), col("ccodes"), (a, b) => a * b),
          lit(0L), (acc, v) => acc + v).as("score"))
    TopK.perGroup(scored, Seq("qid"),
        Seq(col("score").desc, col("cid")), k, rankName = "rank")
      .select("qid", "cid", "score", "rank")
  }
}
