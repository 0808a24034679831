package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic contiguous sequence packing — the step between
  * chunking and the training-shard writer: lay token-counted pieces
  * end-to-end and assign each to the fixed-size context bin its first
  * token lands in.
  *
  * Distributed contract: rows first shard by a hash of `shardKey`
  * (all pieces of a document stay together), then pack CONTIGUOUSLY
  * within their shard in `orderCols` order. True first-fit bin
  * packing is inherently sequential; per-shard contiguous packing is
  * the standard distributed rendering — each shard's window is
  * independent, so the one shuffle partitions by shard and scales
  * with shard count. Bins overflow a context at most by one piece's
  * tokens (bound piece size ≤ ctx upstream via TextOps.chunks), and
  * assignment is a pure function of (key hash, order, token counts):
  * partitioning-invariant, append-stable within a shard's suffix,
  * and exactly replayable in SQL (integer cumsum / div / mod).
  */
object Packing {

  /** Exact GLOBAL prefix sum of `valueCol` in `orderCol` order,
    * without ever sorting the data through one partition: rows
    * coarse-bucket by `orderCol div bucketSize`, bucket subtotals
    * (one map-side-combined agg) prefix-scan on the BUCKET table
    * (|buckets| rows of metadata — the only ordered single-partition
    * step), offsets broadcast back, and the within-bucket cumsum runs
    * in a bucket-partitioned window (parallelism = |buckets|). Value-
    * identical to `sum().over(Window.orderBy(orderCol))` — the
    * PositionalSplit trade applied to prefix sums. Pick `bucketSize`
    * so |buckets| stays driver/broadcast-friendly (≈√N splits the
    * work evenly; at 10¹¹ rows, bucketSize 10⁶ keeps the bucket
    * table at 10⁵ rows). `orderCol` must be integral and UNIQUE —
    * duplicate order keys make any cumsum order-ambiguous.
    */
  def globalCumsum(
      df: DataFrame,
      orderCol: String,
      valueCol: String,
      outCol: String,
      bucketSize: Long = 1024L): DataFrame = {
    require(bucketSize > 0)
    val b = df.withColumn("gc_bucket", expr(s"`$orderCol` div $bucketSize"))
    val wPrev = Window.orderBy("gc_bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = b.groupBy("gc_bucket")
      .agg(sum(col(valueCol)).as("gc_bsum"))
      .withColumn("gc_offset", coalesce(sum("gc_bsum").over(wPrev), lit(0L)))
      .drop("gc_bsum")
    val wIn = Window.partitionBy("gc_bucket").orderBy(orderCol)
    b.join(broadcast(offsets), "gc_bucket")
      .withColumn(outCol, col("gc_offset") + sum(col(valueCol)).over(wIn))
      .drop("gc_bucket", "gc_offset")
  }

  /** Concat-and-cut pretraining sequence layout (the GPT-style
    * alternative to per-shard packing): every document contributes
    * `nTokensCol + eosTokens` tokens to ONE global stream in
    * `orderCol` order, and the stream is cut into fixed `seqLen`
    * windows that CROSS document boundaries. Emits one row per
    * (document, training sequence it touches): `start_tok`/`end_tok`
    * are the doc's inclusive global token span, `seq_id` the window
    * index, `seq_tokens` how many of the doc's tokens land in that
    * window. The explode fan-out per doc is ⌈t/seqLen⌉+1 rows —
    * linear in corpus tokens — and everything after the prefix sum
    * (globalCumsum above) is map-only integer arithmetic: the whole
    * layout is a pure function of (order, token counts), replayable
    * in SQL and stable under repartitioning.
    */
  def concatCut(
      df: DataFrame,
      orderCol: String,
      nTokensCol: String,
      seqLen: Long,
      eosTokens: Int = 1,
      bucketSize: Long = 1024L): DataFrame = {
    require(seqLen > 0)
    val withT = df.withColumn("cc_t", col(nTokensCol) + lit(eosTokens))
    globalCumsum(withT, orderCol, "cc_t", "cc_cum", bucketSize)
      .withColumn("start_tok", col("cc_cum") - col("cc_t"))
      .withColumn("end_tok", col("cc_cum") - 1)
      .withColumn("seq_id", explode(sequence(
        expr(s"start_tok div $seqLen"), expr(s"end_tok div $seqLen"))))
      .withColumn("seq_tokens",
        least(col("end_tok"), (col("seq_id") + 1) * seqLen - 1)
          - greatest(col("start_tok"), col("seq_id") * seqLen) + 1)
      .drop("cc_t", "cc_cum")
  }

  /** Adds (shard, cum_tokens, bin, start_offset); `ctx` is the
    * context length in tokens, `shards` the parallel packing lanes.
    */
  def packContiguous(
      df: DataFrame,
      shardKey: String,
      orderCols: Seq[String],
      nTokensCol: String,
      ctx: Int,
      shards: Int): DataFrame = {
    require(ctx > 0 && shards > 0)
    val w = Window.partitionBy("shard").orderBy(orderCols.map(col): _*)
    df.withColumn("shard", Sampling.hashBucket(col(shardKey), shards))
      .withColumn("cum_tokens", sum(col(nTokensCol)).over(w))
      .withColumn("bin",
        ((col("cum_tokens") - col(nTokensCol)) / lit(ctx)).cast("long"))
      .withColumn("start_offset",
        pmod(col("cum_tokens") - col(nTokensCol), lit(ctx.toLong)))
  }

  /** Length-bucketed batching planner — the padding-waste decision
    * for VARIABLE-length training (SFT / reranker / encoder batches,
    * where examples are padded to the batch max rather than packed
    * end-to-end like [[concatCut]]): split the corpus into `b`
    * equal-population length buckets and report each bucket's padding
    * waste n_b·max_b − Σlen, next to the single-bucket baseline
    * n·max − Σlen the plan is rescuing you from.
    *
    * Equi-depth on the LENGTH HISTOGRAM, not the rows: the corpus
    * folds once to (len, cnt) — at most max-sequence-length rows of
    * metadata — and every downstream step (cumulative counts, the
    * bucket rule, per-bucket aggregates) runs on that table. The only
    * ordered single-partition stage is the histogram scan, bounded by
    * the tokenizer's context limit, never by corpus size. Bucket rule
    * is pure integer arithmetic — bucket(len) = cum_below(len)·b
    * div n — so assignment is exact, deterministic, monotone in len,
    * and puts every row of one length in one bucket (population
    * balance is then within one length-value's multiplicity of
    * perfect — the best any non-splitting rule can do). Long bounds:
    * cum·b ≤ n·b and n_b·max_b both < 2⁶³ past 10¹⁵ token-rows.
    */
  def lengthBucketPlan(df: DataFrame, len: org.apache.spark.sql.Column,
      b: Int): DataFrame = {
    require(b > 0, s"bucket count must be positive, got $b")
    val hist = df.select(len.cast("long").as("len"))
      .groupBy("len").agg(count(lit(1)).as("cnt"))
    val wcum = Window.orderBy("len")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bucketed = hist
      .withColumn("cum", sum("cnt").over(wcum))
      .crossJoin(broadcast(hist.agg(sum("cnt").as("n"))))
      .withColumn("bucket", ((col("cum") - col("cnt")) * b / col("n"))
        .cast("long"))
    val glob = bucketed.agg(
      (sum(col("cnt")) * max(col("len")) - sum(col("len") * col("cnt")))
        .as("baseline_waste_tokens"))
    bucketed.groupBy("bucket")
      .agg(
        sum("cnt").as("n_docs"),
        max("len").as("max_len"),
        sum(col("len") * col("cnt")).as("sum_tokens"))
      .withColumn("waste_tokens",
        col("n_docs") * col("max_len") - col("sum_tokens"))
      .withColumn("waste_ppm",
        when(col("n_docs") * col("max_len") === 0, 0L)
          .otherwise(floor(lit(1e6) * col("waste_tokens")
            / (col("n_docs") * col("max_len"))).cast("long")))
      .crossJoin(broadcast(glob))
  }
}
