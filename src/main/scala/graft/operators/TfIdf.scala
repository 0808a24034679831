package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** TF-IDF scoring over a document corpus — the classic relevance /
  * keyword-extraction signal for an LLM data pipeline (salient-term
  * tagging, near-boilerplate detection via low-idf mass).
  *
  * Scale shape: the token explode is map-side; term frequencies
  * shuffle once on (doc, term); document frequencies reduce the tf
  * table by term — the df/idf table is VOCABULARY-sized (sub-linear
  * in corpus size; Heaps' law), so at 100 TB it either broadcasts or
  * hash-joins by term, and the per-doc top-k runs on the
  * TopKPerGroup heap plan (no per-document sort). No driver-side
  * collection anywhere: the corpus size enters as a broadcast grand
  * aggregate, the same pattern as the A2 min-max normalize.
  *
  * idf uses sklearn's smoothed form ln((N+1)/(df+1)) + 1 (never
  * zero, no division by zero for unseen terms).
  */
object TfIdf {

  /** Feature hashing (the hashing trick — Weinberger et al.,
    * ICML'09): project bag-of-words into a FIXED D-dimensional space
    * with no vocabulary table at all — bucket = affine-hash(term
    * fingerprint) mod D, sign = a second hash bit, weight per (doc,
    * bucket) = Σ sign. The signed sum makes collisions cancel in
    * expectation (the paper's unbiasedness trick), and "no vocab" is
    * the 100 TB property: the encoder is STATELESS — no fit pass, no
    * broadcast dictionary, new terms never resize anything, and
    * train/serve cannot skew. All per-token hashing runs on the
    * DISTINCT-token vocabulary (Heaps-sublinear) and joins back;
    * output is the sparse (id, bucket, w) triple table, zero rows
    * dropped silently (w = 0 cancellations ARE dropped — that's the
    * representation, not a cap). Exact integer end to end.
    */
  def hashedFeatures(docs: DataFrame, idCol: String, textCol: String,
      dims: Int): DataFrame = {
    require(dims > 0, s"dims must be positive, got $dims")
    val toks = docs.select(col(idCol).as("id"),
      explode(TextOps.tokens(col(textCol))).as("term"))
    val vocab = toks.select("term").distinct()
      .withColumn("fp", graft.expressions.TextFingerprint(col("term")))
      .withColumn("bucket", Sampling.hashBucket(col("fp"), dims))
      .withColumn("sign",
        lit(1L) - lit(2L) * (Sampling.orderHash(col("fp")) % 2))
      .select("term", "bucket", "sign")
    toks.join(broadcast(vocab), Seq("term"))
      .groupBy(col("id"), col("bucket"))
      .agg(sum("sign").as("w"))
      .filter(col("w") =!= 0)
  }

  /** Okapi BM25 defaults — interpolated into every oracle SQL string
    * that replays bm25Scores (q_t_bm25, q_r_hybrid_rrf), so the Scala
    * and SQL renderings cannot silently drift (the same
    * one-constant convention as Dedup.DefaultMaxBucket).
    */
  val DefaultK1 = 1.2
  val DefaultB = 0.75

  /** (id, term, tf) — term frequencies per document. */
  def termFreq(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"),
        explode(TextOps.tokens(col(textCol))).as("term"))
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))

  /** (term, df, idf) — vocabulary-sized. `nDocs` rides in as a
    * broadcast grand agg, not a driver action.
    */
  def idfTable(tf: DataFrame, docs: DataFrame): DataFrame = {
    val n = docs.agg(count(lit(1)).as("n_docs"))
    tf.groupBy("term").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(n))
      .withColumn("idf",
        log((col("n_docs") + lit(1.0)) / (col("df") + lit(1.0))) + lit(1.0))
      .select("term", "df", "idf")
  }

  /** (id, term, tf, score) — the full scored posting table. */
  def scores(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = termFreq(docs, idCol, textCol)
    tf.join(idfTable(tf, docs), Seq("term"))
      .withColumn("score", col("tf") * col("idf"))
      .select("id", "term", "tf", "score")
  }

  /** Top-k salient terms per document by TF-IDF (heap plan; ties by
    * term). Output: (id, term, tf, score, rank).
    */
  def topTerms(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame =
    TopK.perGroup(scores(docs, idCol, textCol), Seq("id"),
      Seq(col("score").desc, col("term")), k, rankName = "rank")
      .select("id", "term", "tf", "score", "rank")

  /** Okapi BM25 posting scores — the retrieval-grade relevance signal
    * (keyword search over the corpus, salient-term tagging with
    * document-length normalization that plain TF-IDF lacks).
    *
    * idf is the non-negative Robertson form ln(1 + (N-df+0.5)/(df+0.5));
    * the tf saturation uses the classic k1=1.2, b=0.75.
    *
    * Scale shape mirrors [[scores]]: the doc-length table is computed
    * MAP-SIDE from the text (one `size(tokens)`, no extra aggregation)
    * and joins tf on id — the shuffle tf already needs; corpus stats
    * (N, avgdl) ride in as one broadcast grand agg; df is
    * vocabulary-sized and joins by term. All literals are spelled the
    * same way in the SQL oracle so both engines run bit-identical
    * double arithmetic from exact integer counts.
    */
  def bm25Scores(docs: DataFrame, idCol: String, textCol: String,
      k1: Double = DefaultK1, b: Double = DefaultB): DataFrame = {
    val tf = termFreq(docs, idCol, textCol)
    val dl = docs.select(col(idCol).as("id"),
      TextOps.tokenCount(col(textCol)).cast("long").as("dl"))
    val stats = dl.agg(avg("dl").as("avgdl"), count(lit(1)).as("n_docs"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    tf.join(dl, Seq("id"))
      .crossJoin(broadcast(stats))
      .join(df, Seq("term"))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5))
          / (col("df") + lit(0.5))))
      .withColumn("score",
        col("idf") * (col("tf") * lit(k1 + 1.0))
          / (col("tf") + lit(k1) * (lit(1.0 - b)
            + lit(b) * col("dl") / col("avgdl"))))
      .select("id", "term", "tf", "score")
  }

  /** Top-k BM25 terms per document (heap plan; ties by term). */
  def bm25TopTerms(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame =
    TopK.perGroup(bm25Scores(docs, idCol, textCol), Seq("id"),
      Seq(col("score").desc, col("term")), k, rankName = "rank")
      .select("id", "term", "tf", "score", "rank")

  /** Corpus-LM quality scoring: each document's mean token
    * log-probability under the corpus's own add-1-smoothed unigram
    * distribution — the cheap, trainable-model-free stand-in for a
    * perplexity filter (KenLM-style): documents of globally rare /
    * out-of-distribution tokens score low and gate out.
    *
    * Determinism at scale: a SUM of raw double logprobs is
    * partitioning-DEPENDENT (float addition is not associative), so
    * each term's logprob is quantized once to fixed-point micros
    * (`floor(ln(p) * 1e6)` — a LONG) and the per-doc sum runs in
    * exact integer arithmetic; one double division at the end. Same
    * sufficient-statistics trick as Stats.pearsonExact.
    *
    * Residual cross-engine exposure, stated honestly: the quantization
    * happens AFTER a transcendental, so this is partitioning-invariant
    * on any ONE engine (the contract that matters at 100 TB) but one
    * notch weaker than the repo's no-transcendentals convention
    * (cf. weightedPriority, which avoids u^(1/w) entirely): if two
    * engines' `ln` differ by 1 ulp exactly at a ×1e6 floor boundary,
    * that term's micros flip by 1. JVM Math.log is required
    * correctly-rounded-to-≤1ulp and DuckDB rides libm; across the
    * tested vocabularies no boundary case has materialized (q_t_*
    * hash-parity green every round). If strict bit parity across
    * engines ever becomes the contract, swap `ln` for a shared
    * rational approximation over the (integer) c/tt/v inputs — the
    * quantized-sum shape is unchanged.
    *
    * Scale shape: tf shuffles once on (id, term); the count table is
    * vocabulary-sized (Heaps' law) and joins by term; corpus totals
    * (T tokens, V vocab) ride in as one broadcast grand agg. Output:
    * (id, n_tokens, avg_logprob).
    */
  /** Exact fixed-point form of [[unigramLogProb]]: per-doc
    * (id, n_tokens, lp_micros) with the summed-logprob kept as the
    * EXACT integer micros — for compositions (perplexity bucketing,
    * curriculum pacing) that aggregate scores again and must stay
    * partitioning-invariant through the second aggregation.
    */
  def unigramLogProbMicros(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val tok = docs.select(col(idCol).as("id"),
      explode(TextOps.tokens(col(textCol))).as("term"))
    val tf = tok.groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val cnt = tok.groupBy("term").agg(count(lit(1)).as("c"))
    val tot = tok.agg(count(lit(1)).as("tt"),
      count_distinct(col("term")).as("v"))
    val lpMicros = floor(
      log((col("c") + lit(1.0)) / (col("tt") + col("v")))
        * lit(1000000.0)).cast("long")
    tf.join(cnt, Seq("term"))
      .crossJoin(broadcast(tot))
      .groupBy("id")
      .agg(sum(col("tf") * lpMicros).as("lp_micros"),
        sum(col("tf")).as("n_tokens"))
  }

  def unigramLogProb(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    unigramLogProbMicros(docs, idCol, textCol)
      .select(col("id"), col("n_tokens"),
        ((col("lp_micros").cast("double") / lit(1000000.0))
          / col("n_tokens")).as("avg_logprob"))

  /** Interpolated bigram-LM quality scoring — the closer stand-in for
    * CCNet-style perplexity filtering than [[unigramLogProb]]: each
    * within-document bigram (prev, cur) scores
    * `ln(λ·p_bi + (1−λ)·p_uni)` with add-1 smoothing
    * (p_bi = (c(prev,cur)+1)/(c_ctx(prev)+V),
    * p_uni = (c(cur)+1)/(T+V)), quantized ONCE per distinct bigram to
    * fixed-point micros, so per-doc sums are exact integers —
    * partitioning-invariant and SQL-replayable. A document's first
    * token has no context and is not scored (docs under 2 tokens drop
    * out); output (id, n_scored, avg_logprob).
    *
    * One tokenize pass per chain: every count table reduces the
    * per-doc bigram tf table (bg by ReusedExchange, ctx from bg) or
    * the unigram table (T and V from its sums) — the corpus is never
    * re-scanned for totals. The scored-bigram table is
    * distinct-bigram-sized (sub-linear, Heaps' law) and joins back by
    * (prev, cur).
    */
  def bigramLogProb(docs: DataFrame, idCol: String, textCol: String,
      lambda: Double = 0.75): DataFrame = {
    // posexplode + per-doc lag window: measured FASTER at 10× data
    // (sf1 5.7 s) than the window-free array<struct> bigram transform
    // (7.6-8.0 s) — the struct array materializes every token twice
    // map-side, and the saved Exchange(id) is cheaper than that
    val tok = docs.select(col(idCol).as("id"),
      posexplode(TextOps.tokens(col(textCol))).as(Seq("pos", "term")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy("pos")
    val tf = tok
      .withColumn("prev", lag(col("term"), 1).over(w))
      .filter(col("prev").isNotNull)
      .groupBy("id", "prev", "term").agg(count(lit(1)).as("tf"))
    val bg = tf.groupBy("prev", "term").agg(sum("tf").as("cb"))
    val ctx = bg.groupBy("prev").agg(sum("cb").as("cc"))
    val uni = tok.groupBy("term").agg(count(lit(1)).as("cu"))
    val tot = uni.agg(sum("cu").as("tt"), count(lit(1)).as("v"))
    val scored = bg.join(ctx, Seq("prev")).join(uni, Seq("term"))
      .crossJoin(broadcast(tot))
      .withColumn("lp_micros", floor(log(
        lit(lambda) * ((col("cb") + lit(1.0)) / (col("cc") + col("v")))
          + lit(1.0 - lambda)
            * ((col("cu") + lit(1.0)) / (col("tt") + col("v"))))
        * lit(1000000.0)).cast("long"))
      .select("prev", "term", "lp_micros")
    tf.join(scored, Seq("prev", "term"))
      .groupBy("id")
      .agg(sum(col("tf") * col("lp_micros")).as("lpm"),
        sum(col("tf")).as("n_scored"))
      .select(col("id"), col("n_scored"),
        ((col("lpm").cast("double") / lit(1000000.0)) / col("n_scored"))
          .as("avg_logprob"))
  }
}
