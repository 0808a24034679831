package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.operators.Similarity
import graft.streaming.StreamDiversity

/** The streamed diversity state must finish to the bit-exact batch
  * mean-pairwise-cosine of the same rows: the moment-identity
  * sufficient statistics are order-free exact long sums, and the ppm
  * finish is shared code.
  */
class StreamDiversitySpec extends SparkSpec {

  test("streamed pos-sums + shared finish == batch meanPairwiseCosine, " +
      "bit for bit; state is dim rows per group") {
    val e = Tables.embeddings(spark, Sf0001)
      .select(col("label"), col("embedding"))

    val dir = tmpDir("stream_diversity")
    e.write.mode("overwrite").parquet(dir + "/in")

    val sink = s"div_state_${System.nanoTime()}"
    val q = StreamDiversity.posSums(
        spark.readStream.schema(e.schema).parquet(dir + "/in"),
        "label", "embedding")
      .writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", dir + "/ckpt")
      .start()
    q.awaitTermination(120000)

    val state = spark.table(sink)
    val nGroups = e.select("label").distinct().count()
    assert(state.count() === nGroups * 64) // dim rows per group
    val streamed = StreamDiversity.diversityFrom(state, "label")
      .collect().map(_.toSeq).toSet
    val batch = Similarity.meanPairwiseCosine(e, "label", "embedding")
      .collect().map(_.toSeq).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }
}
