package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.operators.Drift
import graft.streaming.StreamEmbeddingDrift

/** Round-10: per-dimension embedding drift, batch and streaming. */
class StreamEmbeddingDriftSpec extends SparkSpec {
  import spark.implicits._

  test("embeddingDrift: exact micros means incl. true floor on " +
      "negative non-divisible sums; signed delta") {
    val rows = Seq(
      (true, Seq(1.0f, -1.0f)), (true, Seq(2.0f, -2.000001f)),
      (false, Seq(3.0f, 0.5f)))
    val df = rows.toDF("is_ref", "v")
    val out = Drift.embeddingDrift(df, col("is_ref"), col("v"))
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toMap
    // dim0 ref: (1e6 + 2e6)/2 = 1_500_000; cur: 3e6
    assert(out(0) == ((2L, 1L, 1500000L, 3000000L, 1500000L)))
    // dim1 ref: floor(-2.000001*1e6) = -2000001 (float widens to a
    // value just under -2.000001, floor -2000001); sum -3000001,
    // floor(-3000001/2) = -1500001 — TRUE floor, not trunc
    assert(out(1)._3 == -1500001L, s"got ${out(1)}")
    assert(out(1)._5 == 500000L - -1500001L)
  }

  test("streamed dim stats + shared finish == batch embeddingDrift, " +
      "bit for bit; state is one row per dimension") {
    val all = Tables.embeddings(spark, Sf0001)
    val ref = all.filter(col("label") < 5)
    val cur = all.filter(!(col("label") < 5))
    val dir = tmpDir("stream_embdrift")
    cur.select("vec_id", "embedding").write.mode("overwrite")
      .parquet(dir + "/in")

    val sink = s"embdrift_state_${System.nanoTime()}"
    val q = StreamEmbeddingDrift.dimStats(
        spark.readStream
          .schema(cur.select("vec_id", "embedding").schema)
          .parquet(dir + "/in"),
        col("embedding"))
      .writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", dir + "/ckpt")
      .start()
    q.awaitTermination(120000)

    val state = spark.table(sink)
    assert(state.count() === 64L) // one stats row per dimension
    val refStats = Drift.embeddingDimStats(ref, col("embedding"))
    val streamed = StreamEmbeddingDrift.driftFrom(refStats, state)
      .collect().map(_.toSeq).toSet
    val batch = Drift.embeddingDrift(all, col("label") < 5,
        col("embedding"))
      .collect().map(_.toSeq).toSet
    assert(streamed === batch && streamed.size == 64)
  }
}
