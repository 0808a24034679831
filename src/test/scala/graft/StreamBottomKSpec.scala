package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.operators.Sampling
import graft.streaming.StreamBottomK

/** The drained per-shard minima must finish to the bit-exact batch
  * bottom-k sample of the same rows — the mergeability property
  * (union → bottom-k = global bottom-k) makes per-shard k-minima a
  * sufficient state, bounded at O(shards·k) regardless of volume.
  */
class StreamBottomKSpec extends SparkSpec {
  import spark.implicits._

  test("streamed per-shard minima + global bottom-k finish == batch " +
      "bottomKSample, bit for bit; state bounded at shards x k") {
    // transformWithState requires the RocksDB state store provider
    val prev = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
    val n = 5000L
    val k = 100
    val ids = spark.range(n).select(col("id"))
    val rows = ids.select(
        Sampling.hashBucket(col("id"), 16).cast("int").as("shard"),
        Sampling.orderHash(col("id")).as("pri"), col("id"))
      .as[StreamBottomK.RowIn]

    val dir = tmpDir("stream_bottomk")
    rows.write.mode("overwrite").parquet(dir + "/in")

    val sink = s"bottomk_state_${System.nanoTime()}"
    val q = StreamBottomK.perShardMinima(
        spark.readStream.schema(rows.schema).parquet(dir + "/in")
          .as[StreamBottomK.RowIn], k)
      .writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", dir + "/ckpt")
      .start()
    drainTws(q)

    val state = spark.table(sink)
    assert(state.count() <= 16L, "one emission per shard per trigger")
    // finish: explode the drained minima, run the SAME global bottom-k
    val drained = state
      .select(explode(arrays_zip(col("pris"), col("ids"))).as("z"))
      .select(col("z.pris").as("pri"), col("z.ids").as("id"))
    val streamedSample = drained.orderBy(col("pri"), col("id")).limit(k)
      .select("id").collect().map(_.getLong(0)).toSet
    val batchSample = Sampling.bottomKSample(ids, "id", k)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(streamedSample === batchSample)
    assert(streamedSample.size === k)
    // state bound: no shard retains more than k pairs
    val maxKept = state.select(size(col("pris")).as("s"))
      .agg(max("s")).collect().head.getInt(0)
    assert(maxKept <= k)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
