package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.operators.Survival
import graft.streaming.StreamSurvival

/** The streamed per-user extents must finish to the bit-exact batch
  * Kaplan–Meier curve of the same rows: min/max are order-free merges
  * over the user key, and the curve finish is shared code.
  */
class StreamSurvivalSpec extends SparkSpec {

  test("streamed user extents + shared finish == batch kaplanMeier, " +
      "bit for bit; one state row per user") {
    val ev = Tables.events(spark, Sf0001)
      .select(col("user_id"), unix_timestamp(col("ts")).as("sec"))

    val dir = tmpDir("stream_km")
    ev.write.mode("overwrite").parquet(dir + "/in")

    val sink = s"km_state_${System.nanoTime()}"
    val q = StreamSurvival.userExtents(
        spark.readStream.schema(ev.schema).parquet(dir + "/in"),
        "user_id", col("sec"))
      .writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", dir + "/ckpt")
      .start()
    q.awaitTermination(120000)

    val state = spark.table(sink)
    assert(state.count() === ev.select("user_id").distinct().count())
    val streamed = StreamSurvival.curveFrom(state, censorGapDays = 7)
      .collect().map(_.toSeq).toSet
    val batch = Survival.kaplanMeier(ev, "user_id", col("sec"), 7)
      .collect().map(_.toSeq).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }
}
