package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.operators.Drift
import graft.streaming.StreamDrift

/** The streamed PSI state must finish to the bit-exact batch PSI of
  * the same rows: bin counting is an order-free sum over a bounded
  * key domain, and the finish arithmetic is shared code.
  */
class StreamDriftSpec extends SparkSpec {

  test("streamed current-side PSI == batch PSI, bit for bit") {
    val li = Tables.lineitem(spark, Sf0001).select("l_quantity", "l_shipdate")
    val ref = li.filter(year(col("l_shipdate")) === 1995).select("l_quantity")
    val cur = li.filter(year(col("l_shipdate")) === 1996).select("l_quantity")

    val dir = tmpDir("stream_psi")
    cur.write.mode("overwrite").parquet(dir + "/in")

    val sink = s"psi_state_${System.nanoTime()}"
    val q = StreamDrift.binCounters(
        spark.readStream.schema(cur.schema).parquet(dir + "/in"),
        "l_quantity", 1.0, 51.0, 10)
      .writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", dir + "/ckpt")
      .start()
    q.awaitTermination(120000)

    val refCounts = Drift.binCounts(ref, "l_quantity", 1.0, 51.0, 10, "n_ref")
    val streamed = StreamDrift.psiAgainst(refCounts, spark.table(sink), 10)
      .collect().map(_.toSeq).toSet
    val batch = Drift.psiNumeric(ref, cur, "l_quantity", 1.0, 51.0, 10)
      .collect().map(_.toSeq).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }
}
