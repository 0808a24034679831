package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.operators.Stats
import graft.streaming.StreamHolt

/** The streamed period-sum state must finish to the bit-exact batch
  * Holt summary of the same rows: bucket sums are order-free exact
  * integer merges, and the sequential Holt fold is shared finish code
  * over the drained periods-sized series.
  */
class StreamHoltSpec extends SparkSpec {

  test("streamed bucket sums + shared finish == batch " +
      "holtLinearSummary, bit for bit; state is one row per period") {
    val ev = Tables.events(spark, Sf0001)
      .select(expr("unix_timestamp(ts) div 86400").as("d"),
        floor(col("value") * 100).cast("long").as("v"))

    val dir = tmpDir("stream_holt")
    ev.write.mode("overwrite").parquet(dir + "/in")

    val sink = s"holt_state_${System.nanoTime()}"
    val q = StreamHolt.bucketSums(
        spark.readStream.schema(ev.schema).parquet(dir + "/in"),
        col("d"), col("v"))
      .writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", dir + "/ckpt")
      .start()
    q.awaitTermination(120000)

    val state = spark.table(sink)
    val nPeriods = ev.select("d").distinct().count()
    assert(state.count() === nPeriods) // one sum row per period
    val streamed = StreamHolt.holtFrom(state).collect().map(_.toSeq)
    val batch = Stats.holtLinearSummary(
        ev.groupBy(col("d").as("t")).agg(sum("v").as("x")), "t", "x")
      .collect().map(_.toSeq)
    assert(streamed === batch)
    assert(streamed.head.nonEmpty)
  }
}
