package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (DSIR, Xie et al.
  * NeurIPS'23): score every raw-corpus document by the
  * log-likelihood ratio of a TARGET distribution to the RAW
  * distribution over hashed n-gram features, then keep the
  * highest-ratio documents — the standard cheap proxy for "select
  * pretraining data that looks like the high-quality target set"
  * (the reference's quality gates filter on per-doc heuristics;
  * this is the corpus-relative complement).
  *
  * Determinism contract (house convention): each bucket's two
  * smoothed log-probabilities are quantized ONCE to fixed-point
  * micros (`floor(ln(p) * 1e6)` — the unigramLogProb shape,
  * TfIdf.scala); the per-document score is then an exact integer
  * dot product `Σ tf_b · (lt_b − lr_b)`, partitioning-invariant
  * and bit-replayable in SQL. One double division at the end for
  * the per-token average.
  *
  * Scale shape: token explode is map-side; the per-doc (id, bucket)
  * tf table shuffles once; both bucket-count tables have at most
  * `buckets` rows (a CONSTANT — default 256), so the ratio table
  * broadcasts and scoring is a map-side join + one groupBy(id).
  * Corpus totals ride in as broadcast grand aggregates — no driver
  * action anywhere. The hashed-feature trick is exactly what makes
  * DSIR 100 TB-safe: vocabulary never materializes, state is O(B).
  */
object Dsir {

  /** Feature-hash bucket count. Interpolated into every oracle SQL
    * replaying these weights so Scala and SQL cannot drift.
    */
  val DefaultBuckets = 256

  private def bucketed(df: DataFrame, textCol: String, buckets: Int) =
    df.select(explode(TextOps.tokens(col(textCol))).as("term"))
      .select(pmod(TextOps.polyFold31(col("term")), lit(buckets.toLong))
        .as("bucket"))

  /** (bucket, lr_micros) from the two bucket-count tables. Corpus
    * totals derive from SUMS OVER THE COUNT TABLES (≤ `buckets`
    * rows) — never a second pass over the tokens.
    */
  private def ratiosFromCounts(cr: DataFrame, ct: DataFrame,
      buckets: Int): DataFrame = {
    val totR = cr.agg(sum("cr").as("tr"))
    val totT = ct.agg(sum("ct").as("tt"))
    def lpMicros(c: org.apache.spark.sql.Column,
        t: org.apache.spark.sql.Column) =
      floor(log((c + lit(1.0)) / (t + lit(buckets.toDouble)))
        * lit(1000000.0)).cast("long")
    cr.join(ct, Seq("bucket"), "full_outer")
      .na.fill(0L, Seq("cr", "ct"))
      .crossJoin(broadcast(totR))
      .na.fill(Map("tr" -> 0L))
      .crossJoin(broadcast(totT))
      .na.fill(Map("tt" -> 0L))
      .select(col("bucket"),
        (lpMicros(col("ct"), col("tt")) - lpMicros(col("cr"), col("tr")))
          .as("lr_micros"))
  }

  /** (bucket, lr_micros) — per-bucket quantized log-likelihood
    * ratio table, at most `buckets` rows. Built full-outer so a
    * target-only bucket (possible when `target` is not a subset of
    * `raw`) still scores.
    */
  def bucketRatios(raw: DataFrame, target: DataFrame, textCol: String,
      buckets: Int = DefaultBuckets): DataFrame =
    ratiosFromCounts(
      bucketed(raw, textCol, buckets).groupBy("bucket")
        .agg(count(lit(1)).as("cr")),
      bucketed(target, textCol, buckets).groupBy("bucket")
        .agg(count(lit(1)).as("ct")),
      buckets)

  /** Per-document importance weights: (id, n_tokens, lr_sum_micros,
    * avg_log_ratio). `lr_sum_micros` is the exact integer total log
    * ratio (the paper's sampling weight); `avg_log_ratio` is the
    * length-normalized per-token mean (the filter-threshold
    * rendering — total favors long documents).
    *
    * One tokenization pass per corpus: the raw bucket counts reduce
    * the per-doc tf table (same exchange subtree → ReusedExchange,
    * not a second scan) and totals reduce the ≤`buckets`-row count
    * tables.
    */
  def importanceWeights(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, buckets: Int = DefaultBuckets): DataFrame = {
    val tf = raw
      .select(col(idCol).as("id"),
        explode(TextOps.tokens(col(textCol))).as("term"))
      .select(col("id"),
        pmod(TextOps.polyFold31(col("term")), lit(buckets.toLong))
          .as("bucket"))
      .groupBy("id", "bucket").agg(count(lit(1)).as("tf"))
    val cr = tf.groupBy("bucket").agg(sum("tf").as("cr"))
    val ct = bucketed(target, textCol, buckets).groupBy("bucket")
      .agg(count(lit(1)).as("ct"))
    tf.join(broadcast(ratiosFromCounts(cr, ct, buckets)), Seq("bucket"))
      .groupBy("id")
      .agg(sum(col("tf") * col("lr_micros")).as("lr_sum_micros"),
        sum(col("tf")).as("n_tokens"))
      .select(col("id"), col("n_tokens"), col("lr_sum_micros"),
        ((col("lr_sum_micros").cast("double") / lit(1000000.0))
          / col("n_tokens")).as("avg_log_ratio"))
  }

  /** Top-`k` documents by per-token average log ratio (ties broken
    * by id). Renders as TakeOrderedAndProject — a distributed
    * per-partition heap + driver merge of k rows, never a global
    * sort, so the selection itself is 100 TB-safe. (The
    * proportional-sampling rendering of the paper composes
    * `importanceWeights` with Sampling.weightedSample instead.)
    */
  def selectTopK(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, k: Int,
      buckets: Int = DefaultBuckets): DataFrame =
    importanceWeights(raw, target, idCol, textCol, buckets)
      .orderBy(col("avg_log_ratio").desc, col("id"))
      .limit(k)

  /** The paper's sampling rendering — k draws WITHOUT replacement,
    * inclusion probability ∝ exp(total log ratio) — with NO exp
    * anywhere: the A-ES priority w/u (Sampling.weightedPriority's
    * scheme, w = exp(lr)) compares identically in LOG space as
    * `lr − ln(u)`, and both terms quantize to exact integer micros
    * (lr_sum_micros is already one; u is the deterministic affine
    * hash of the id, so `floor(ln(u)·1e6)` is a pure function of the
    * id). Priorities are exact longs → partitioning-invariant,
    * SQL-replayable, and the top-k cut is a TakeOrderedAndProject
    * (per-partition heap), never a global sort. Exponential-family
    * weighted sampling with integer determinism — the quantization
    * IS the operator's definition and the oracle replays it.
    */
  def sampleProportional(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, k: Int,
      buckets: Int = DefaultBuckets): DataFrame = {
    val u = (Sampling.hashBucket(col("id"), 1000000) + lit(1))
      .cast("double") / lit(1000000.0)
    importanceWeights(raw, target, idCol, textCol, buckets)
      .withColumn("priority_micros",
        col("lr_sum_micros")
          - floor(log(u) * lit(1000000.0)).cast("long"))
      .orderBy(col("priority_micros").desc, col("id"))
      .limit(k)
  }
}
