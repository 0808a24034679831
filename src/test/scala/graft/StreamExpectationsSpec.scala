package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.operators.Expectations
import graft.operators.Expectations.RowRule
import graft.streaming.StreamExpectations

/** Drained streaming expectation counters must equal the batch
  * auditRows bit-for-bit: rules-sized key domain, order-free sums.
  */
class StreamExpectationsSpec extends SparkSpec {

  test("drained stream audit == batch auditRows, bit for bit") {
    val li = Tables.lineitem(spark, Sf0001)
      .select("l_quantity", "l_discount", "l_extendedprice")
    val rules = Seq(
      RowRule("r1_qty_range", !col("l_quantity").between(1, 45)),
      RowRule("r2_discount_range", !col("l_discount").between(0.0, 0.08)),
      RowRule("r4_price_floor", col("l_extendedprice") < 1000))

    val dir = tmpDir("stream_exp")
    li.repartition(3).write.mode("overwrite").parquet(dir + "/in")

    val sink = s"exp_state_${System.nanoTime()}"
    val q = StreamExpectations.auditCounters(
        spark.readStream.schema(li.schema).parquet(dir + "/in"), rules)
      .writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", dir + "/ckpt")
      .start()
    q.awaitTermination(120000)

    val streamed = spark.table(sink).collect().map(_.toSeq).toSet
    val batch = Expectations.auditRows(li, rules)
      .collect().map(_.toSeq).toSet
    assert(streamed === batch)
    assert(streamed.size === 3)
  }
}
