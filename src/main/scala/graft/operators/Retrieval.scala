package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hybrid retrieval — the RAG-ingest side of an LLM data pipeline:
  * a sparse lexical ranking (BM25 "more-like-this") and a dense
  * embedding ranking (cosine top-k) fused with Reciprocal Rank
  * Fusion (Cormack, Clarke & Buettcher, SIGIR'09):
  *
  *   rrf(d) = Σ_lists 1 / (k0 + rank_list(d)),   k0 = 60 classic.
  *
  * RRF needs only RANKS, never raw scores, which is what makes it the
  * robust default for fusing heterogeneous retrievers — and what
  * makes it exactly reproducible here: both input rankings are
  * deterministic (integer-micros BM25 sums; cosine with fixed
  * tie-break), so the fused ordering is a pure function of the data.
  *
  * Scale shape: the sparse side is an inverted-index join — probe
  * term sets broadcast (|probes| · avg terms rows), the posting table
  * shuffles once on term, and the per-(probe, candidate) reduction is
  * a map-side-combining integer sum; the dense side broadcasts probe
  * vectors over a single candidate scan (Similarity.bruteForceTopK's
  * heap plan, or its LSH/IVF variants at larger probe counts); the
  * fusion itself touches only 2·|probes|·k rank rows — metadata-scale
  * no matter the corpus size.
  */
object Retrieval {

  /** Sparse "more-like-this": BM25 relevance of every candidate doc
    * to each probe doc's (distinct) term set — probe text as query,
    * classic query-as-term-set BM25. Per-term scores quantize to
    * fixed-point micros BEFORE the per-(probe, candidate) sum (the
    * unigramLogProb pattern): the reduction is an exact integer sum,
    * partitioning-invariant, and the ranking that feeds RRF is
    * deterministic with ties broken on candidate id.
    *
    * Output: (qid, cid, sbm_micros, rank), rank 1..k per qid;
    * candidates never score against themselves.
    */
  def bm25MoreLikeThis(docs: DataFrame, idCol: String, textCol: String,
      probeFilter: Column, k: Int): DataFrame = {
    val scored = TfIdf.bm25Scores(docs, idCol, textCol)
      .withColumn("s_micros",
        floor(col("score") * lit(1000000.0)).cast("long"))
    val probeTerms = docs.filter(probeFilter)
      .select(col(idCol).as("qid"),
        explode(array_distinct(TextOps.tokens(col(textCol)))).as("term"))
    val summed = scored
      .join(broadcast(probeTerms), Seq("term"))
      .filter(col("id") =!= col("qid"))
      .groupBy(col("qid"), col("id").as("cid"))
      .agg(sum("s_micros").as("sbm_micros"))
    TopK.perGroup(summed, Seq("qid"),
      Seq(col("sbm_micros").desc, col("cid")), k, rankName = "rank")
      .select("qid", "cid", "sbm_micros", "rank")
  }

  /** Reciprocal Rank Fusion of two (qid, cid, rank) lists. A doc
    * absent from one list contributes only the other term (the
    * standard convention). Output: (qid, cid, rrf, rank) — top `k`
    * fused per qid, rrf rounded to 6dp for stable cross-engine
    * comparison, ties on cid.
    */
  def rrfFuse(dense: DataFrame, sparse: DataFrame,
      k: Int, k0: Int = 60): DataFrame = {
    val d = dense.select(col("qid"), col("cid"),
      col("rank").as("rank_dense"))
    val s = sparse.select(col("qid"), col("cid"),
      col("rank").as("rank_sparse"))
    val fused = d.join(s, Seq("qid", "cid"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(k0.toDouble) + col("rank_dense")), lit(0.0))
          + coalesce(lit(1.0) / (lit(k0.toDouble) + col("rank_sparse")),
            lit(0.0)))
    TopK.perGroup(fused, Seq("qid"),
      Seq(col("rrf").desc, col("cid")), k, rankName = "rank")
      .select(col("qid"), col("cid"), round(col("rrf"), 6).as("rrf"),
        col("rank"))
  }

  /** IR evaluation metrics — the retrieval-quality gate for index
    * rungs: given a RUN (a top-k ranking per query: qid, cid, rank)
    * and QRELS (the relevant set per query: qid, cid), per-query
    * reciprocal rank, average precision, and precision@pAt. All three
    * are exact floor-div micros of rational hit fractions — no logs,
    * no floats — so cross-engine replay is bit-exact (nDCG's log2
    * discount lives in [[ndcgAt]], rendered exact by the precomputed
    * discount table rather than a query-time libm term). The AP
    * contract is per-term floors
    * summed: Σ over hit ranks r of (hits@r·10⁶) floorDiv (r·|rel|).
    * Everything runs on the k·|Q| rank rows — metadata after the
    * retrieval heap, regardless of corpus size (the run is already
    * top-k; the one window per qid sorts ≤ k rows).
    */
  def irMetrics(run: DataFrame, qrels: DataFrame, pAt: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nrel = qrels.groupBy("qid").agg(count(lit(1)).as("nrel"))
    val marked = run
      .join(qrels.select(col("qid"), col("cid"), lit(1L).as("hit")),
        Seq("qid", "cid"), "left")
      .na.fill(0L, Seq("hit"))
    val w = Window.partitionBy("qid").orderBy("rank")
    val cum = marked.withColumn("h", sum("hit").over(w))
      .join(broadcast(nrel), Seq("qid"), "left")
      .na.fill(0L, Seq("nrel"))
    cum.groupBy("qid")
      .agg(
        min(when(col("hit") === 1, col("rank"))).as("first_rel"),
        sum(when(col("hit") === 1,
          expr("(h * 1000000) div (rank * nrel)")).otherwise(lit(0L)))
          .as("ap_micros"),
        max(when(col("rank") <= pAt, col("h"))).as("h_at"))
      .select(col("qid"),
        coalesce(expr("1000000 div first_rel"), lit(0L)).as("rr_micros"),
        coalesce(col("ap_micros"), lit(0L)).as("ap_micros"),
        expr(s"(coalesce(h_at, 0) * 1000000) div $pAt").as("p_micros"))
  }

  /** Position-discount table for [[ndcgAt]]: `discountMicros(r)` =
    * ⌊10⁶ / log₂(r+1)⌋. rank ≤ k is a BOUNDED domain, so the one
    * libm evaluation happens here — once, on the driver, shared with
    * the oracle via [[ndcgDiscountSqlValues]] (the same in-memory
    * values render as a VALUES CTE) — and every query-time operation
    * is an exact integer dot-product against the broadcast table
    * (the RBO-rationals pattern). Cross-engine determinism therefore
    * does not depend on two libm implementations agreeing: the table
    * IS the contract.
    */
  def ndcgDiscountMicros(r: Int): Long = {
    require(r >= 1, s"rank must be >= 1, got $r")
    math.floor(1e6 / (math.log(r + 1.0) / math.log(2.0))).toLong
  }

  /** The discount table as a DuckDB VALUES body `(r, d)` for
    * rank 1..k — the oracle replays the SAME integers.
    */
  def ndcgDiscountSqlValues(k: Int): String =
    (1 to k).map(r => s"($r, ${ndcgDiscountMicros(r)})").mkString(", ")

  /** nDCG@k in exact arithmetic (binary relevance from qrels
    * membership):
    *
    *   DCG_micros  = Σ_{r ≤ k, hit_r} discountMicros(r)
    *   IDCG_micros = Σ_{r ≤ min(|rel|, k)} discountMicros(r)
    *   ndcg_micros = (DCG_micros · 10⁶) floorDiv IDCG_micros
    *
    * Both sums are integer dot-products against the broadcast k-row
    * discount table (and its prefix sums for IDCG), so replay is
    * bit-exact. Queries with no qrels score 0. Runs on the k·|Q|
    * rank rows — metadata-scale like [[irMetrics]].
    */
  def ndcgAt(run: DataFrame, qrels: DataFrame, k: Int): DataFrame = {
    val spark = run.sparkSession
    import spark.implicits._
    val disc = (1 to k).map(r => (r.toLong, ndcgDiscountMicros(r)))
    val cums = disc.scanLeft((0L, 0L)) { case ((_, acc), (r, d)) =>
      (r, acc + d) }.tail
    val discDf = broadcast(disc.toDF("rank", "d"))
    val cumDf = broadcast(cums.toDF("j", "idcg_micros"))
    val nrel = qrels.groupBy("qid").agg(count(lit(1)).as("nrel"))
    val dcg = run.filter(col("rank") <= k)
      .join(qrels.select(col("qid"), col("cid"), lit(1L).as("hit")),
        Seq("qid", "cid"), "left")
      .na.fill(0L, Seq("hit"))
      .join(discDf, Seq("rank"))
      .groupBy("qid")
      .agg(sum(col("hit") * col("d")).as("dcg_micros"))
    dcg
      .join(nrel, Seq("qid"), "left")
      .join(cumDf, least(coalesce(col("nrel"), lit(0L)), lit(k.toLong))
        === cumDf("j"), "left")
      .select(col("qid"), col("dcg_micros"),
        coalesce(col("idcg_micros"), lit(0L)).as("idcg_micros"),
        coalesce(expr("(dcg_micros * 1000000) div idcg_micros"), lit(0L))
          .as("ndcg_micros"))
  }
}
