package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.operators.Drift
import graft.streaming.StreamEmd

/** The streamed EMD state must finish to the bit-exact batch EMD of
  * the same rows: bin counting is an order-free sum over a bounded
  * key domain, and the finish is shared EXACT-integer arithmetic (so
  * unlike PSI the alert value itself is deterministic, not merely
  * close).
  */
class StreamEmdSpec extends SparkSpec {

  test("streamed current-side EMD == batch EMD, bit for bit; state " +
      "bounded by nBins") {
    val li = Tables.lineitem(spark, Sf0001).select("l_quantity", "l_shipdate")
    val ref = li.filter(year(col("l_shipdate")) === 1995).select("l_quantity")
    val cur = li.filter(year(col("l_shipdate")) === 1996).select("l_quantity")

    val dir = tmpDir("stream_emd")
    cur.write.mode("overwrite").parquet(dir + "/in")

    val sink = s"emd_state_${System.nanoTime()}"
    val q = StreamEmd.binCounters(
        spark.readStream.schema(cur.schema).parquet(dir + "/in"),
        "l_quantity", 1.0, 51.0, 10)
      .writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", dir + "/ckpt")
      .start()
    q.awaitTermination(120000)

    val state = spark.table(sink)
    assert(state.count() <= 10, "state exceeded the bin domain")
    val refCounts = Drift.binCounts(ref, "l_quantity", 1.0, 51.0, 10, "n_ref")
    val streamed = StreamEmd.emdAgainst(refCounts, state)
      .collect().map(_.toSeq).toSet
    val batch = Drift.emdFromSides(refCounts,
        Drift.binCounts(cur, "l_quantity", 1.0, 51.0, 10, "n_cur"))
      .collect().map(_.toSeq).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }
}
