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
}
