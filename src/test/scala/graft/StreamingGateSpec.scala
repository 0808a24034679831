package graft

import org.apache.spark.sql.streaming.Trigger

import graft.operators.CorpusGate

/** The pretraining gate is one DataFrame transformation shared by the
  * batch catalog entry and the streaming ingest path — this spec runs
  * it both ways over the same parquet and asserts identical rows.
  */
class StreamingGateSpec extends SparkSpec {

  test("corpus gate: streaming (AvailableNow) == batch, bit for bit") {
    val docs = Tables.documents(spark, Sf0001)

    // stage the table as a directory for the file stream source
    val dir = tmpDir("stream_docs")
    docs.write.mode("overwrite").parquet(dir + "/in")

    val batch = CorpusGate.pretrainGate(docs)
      .collect().map(_.toSeq).toSet

    val sink = s"gate_out_${System.nanoTime()}"
    val q = CorpusGate.pretrainGate(
        spark.readStream.schema(docs.schema).parquet(dir + "/in"))
      .writeStream
      .format("memory")
      .queryName(sink)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", dir + "/ckpt")
      .start()
    q.awaitTermination(120000)

    val streamed = spark.table(sink).collect().map(_.toSeq).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("repetition gate: streaming (AvailableNow) == batch, bit for bit") {
    val docs = Tables.documents(spark, Sf0001)

    val dir = tmpDir("stream_rep_docs")
    docs.write.mode("overwrite").parquet(dir + "/in")

    val batch = CorpusGate.repetitionGate(docs)
      .collect().map(_.toSeq).toSet

    val sink = s"rep_gate_out_${System.nanoTime()}"
    val q = CorpusGate.repetitionGate(
        spark.readStream.schema(docs.schema).parquet(dir + "/in"))
      .writeStream
      .format("memory")
      .queryName(sink)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", dir + "/ckpt")
      .start()
    q.awaitTermination(120000)

    val streamed = spark.table(sink).collect().map(_.toSeq).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
    // the gate actually gates: some documents must be dropped
    assert(streamed.size < docs.count())
  }
}
