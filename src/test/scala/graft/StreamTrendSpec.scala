package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.operators.Stats
import graft.streaming.StreamTrend

/** The streamed OLS state must finish to the bit-exact batch slope of
  * the same rows: the sufficient statistics are order-free exact
  * sums over the group key, and the finish arithmetic is shared code.
  */
class StreamTrendSpec extends SparkSpec {

  test("streamed sufficient stats + shared finish == batch " +
      "groupedOlsSlope, bit for bit; state is one row per group") {
    val ev = Tables.events(spark, Sf0001)
      .select(col("event_type").as("g"),
        expr("unix_timestamp(ts) div 86400").as("t"),
        floor(col("value") * 100).cast("long").as("y"))

    val dir = tmpDir("stream_trend")
    ev.write.mode("overwrite").parquet(dir + "/in")

    val sink = s"trend_state_${System.nanoTime()}"
    val q = StreamTrend.sufficientStats(
        spark.readStream.schema(ev.schema).parquet(dir + "/in"),
        "g", col("t"), col("y"))
      .writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", dir + "/ckpt")
      .start()
    q.awaitTermination(120000)

    val state = spark.table(sink)
    val nGroups = ev.select("g").distinct().count()
    assert(state.count() === nGroups) // one stats row per group
    val streamed = StreamTrend.slopesFrom(state)
      .collect().map(_.toSeq).toSet
    val batch = Stats.groupedOlsSlope(ev, "g", col("t"), col("y"))
      .collect().map(_.toSeq).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }
}
