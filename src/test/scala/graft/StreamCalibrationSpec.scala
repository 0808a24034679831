package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.operators.Stats
import graft.streaming.StreamCalibration

/** The streamed calibration state must finish to the bit-exact batch
  * isotonic calibration of the same rows: bin counting is an
  * order-free count/sum over a bounded key domain, and the PAV finish
  * is shared code.
  */
class StreamCalibrationSpec extends SparkSpec {

  test("streamed bin counters + shared PAV finish == batch " +
      "isotonicCalibrate, bit for bit; state bounded by nBins") {
    val docs = Tables.documents(spark, Sf0001)
      .select(
        least(length(col("text")), lit(999)).cast("double").as("x"),
        (col("doc_id") % 10 <
          least(lit(9), expr("length(text) div 120"))).cast("int").as("y"))

    val dir = tmpDir("stream_cal")
    docs.write.mode("overwrite").parquet(dir + "/in")

    val sink = s"cal_state_${System.nanoTime()}"
    val q = StreamCalibration.binCounters(
        spark.readStream.schema(docs.schema).parquet(dir + "/in"),
        col("x"), col("y"), lo = 0.0, hi = 1000.0, nBins = 50)
      .writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", dir + "/ckpt")
      .start()
    q.awaitTermination(120000)

    val state = spark.table(sink)
    assert(state.count() <= 50L) // bounded key domain
    val streamed = StreamCalibration.calibrationFrom(state)
      .collect().map(_.toSeq).toSet
    val batch = Stats.isotonicCalibrate(docs, col("x"), col("y"),
        lo = 0.0, hi = 1000.0, nBins = 50)
      .collect().map(_.toSeq).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }
}
