package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming CDC apply — the continuous face of
  * [[graft.operators.Cdc.applyLatest]]: keep latest-surviving state
  * per key while the change feed arrives.
  *
  * Why this streams exactly (the StreamSketch/StreamDrift argument):
  * the batch operator's whole state is `max(struct(seq…, op,
  * payload…))` per key plus a count — max and count are order-free,
  * associative merges, so Spark's incremental streaming aggregation
  * maintains exactly the batch aggregate regardless of micro-batch
  * boundaries or arrival order (the seq columns totally order
  * changes within a key, so the argmax is well-defined no matter
  * how the feed interleaves). State is one struct per live key.
  *
  * The tombstone filter runs at READ time ([[finish]]) — a delete
  * only wins while it is the key's latest change, and a later
  * upsert in a later micro-batch revives the key, exactly the batch
  * semantics. StreamCdcSpec proves drained-stream ≡ batch
  * bit-for-bit, the house requirement.
  */
object StreamCdc {

  /** Streaming latest-change state: keyCol ++ (_last struct,
    * n_changes). Run under update/complete output mode.
    */
  def latestState(stream: DataFrame, keyCol: String, seqCols: Seq[String],
      opCol: String, payloadCols: Seq[String]): DataFrame = {
    require(seqCols.nonEmpty, "seqCols must order changes within a key")
    val packed = struct(
      (seqCols.map(col) :+ col(opCol)) ++ payloadCols.map(col): _*)
    stream.groupBy(col(keyCol))
      .agg(max(packed).as("_last"), count(lit(1)).as("n_changes"))
  }

  /** Read the live table out of the state: drop tombstoned keys and
    * unpack — identical output schema to the batch operator.
    */
  def finish(state: DataFrame, keyCol: String, seqCols: Seq[String],
      opCol: String, payloadCols: Seq[String],
      deleteOp: String = "D"): DataFrame =
    state.filter(col(s"_last.$opCol") =!= deleteOp)
      .select(
        col(keyCol) +:
          (seqCols ++ payloadCols).map(c => col(s"_last.$c").as(c)) :+
          col("n_changes"): _*)
}
