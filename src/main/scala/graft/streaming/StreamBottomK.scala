package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{
  OutputMode, StatefulProcessor, TimeMode, TimerValues, ValueState}

/** Streaming bottom-k-by-hash sampling — the in-stream face of
  * [[graft.operators.Sampling.bottomKSample]]: a live, exact-size-k,
  * deterministic uniform sample of everything that has flowed past,
  * maintained incrementally (the batch operator's MERGEABILITY —
  * union → bottom-k = global bottom-k, proven in SamplingSpec — is
  * what makes the incremental form correct: a row can only be in the
  * global bottom-k if it is in its shard's bottom-k).
  *
  * State: rows shard by an affine hash of the key (parallelism knob —
  * no single-key bottleneck), and each shard keeps its own k smallest
  * (orderHash, id) pairs in one ValueState — bounded at
  * O(shards · k) TOTAL regardless of stream volume, no TTL needed.
  * Each trigger emits the shard's current minima; the drained states
  * finish through the same global bottom-k as the batch operator,
  * bit-identical to running it over all rows seen (StreamBottomKSpec
  * proves it). Replay-idempotent: the hash is a pure function of the
  * key, so reprocessed rows merge to the same minima.
  *
  * UNIQUE-KEY PRECONDITION: the processor dedups (pri, id) pairs in
  * state (`cur.distinct`) — that is what makes replayed/reprocessed
  * rows idempotent, but it also means a key occurring MULTIPLE times
  * in the stream collapses to one state entry, while the batch
  * [[graft.operators.Sampling.bottomKSample]] keeps duplicate rows.
  * The bit-identical-to-batch contract therefore holds only when ids
  * are unique per shard (the deployed shape: ids are primary keys —
  * doc_id / orderkey — and orderHash is injective-in-practice on
  * them). For multiset semantics, disambiguate ids upstream (e.g.
  * id·2³² + occurrence) before feeding the stream.
  *
  * DRAIN CONTRACT (applies to every transformWithState op in this
  * package, r10): TWS with a ProcessingTime TimeMode runs a
  * micro-batch EVERY trigger — Spark cannot know no timers will fire
  * — so `noNewData` never signals. `processAllAvailable` can hang,
  * `Trigger.AvailableNow` never concludes a MemoryStream snapshot,
  * and `awaitTermination(timeout)` burns its full timeout. Bounded
  * drains should watch the query's PROGRESS stream (stop once
  * `numInputRows` reads 0 for a few consecutive progress events, or
  * the query self-terminates) — the pattern SparkSpec.drainTws
  * implements for the suites.
  */
object StreamBottomK {

  case class RowIn(shard: Int, pri: Long, id: Long)
  case class Minima(pris: Array[Long], ids: Array[Long])
  case class MinimaOut(shard: Int, pris: Array[Long], ids: Array[Long])

  /** Per-shard k-minima maintenance; emits the shard's current minima
    * once per trigger (after consuming the trigger's rows).
    */
  class BottomKProcessor(k: Int, stateEnc: Encoder[Minima])
      extends StatefulProcessor[Int, RowIn, MinimaOut] {

    @transient private var st: ValueState[Minima] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[Minima]("minima", stateEnc,
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(
        key: Int,
        rows: Iterator[RowIn],
        timerValues: TimerValues): Iterator[MinimaOut] = {
      val cur = if (st.exists()) {
        val m = st.get(); m.pris.zip(m.ids).toBuffer
      } else scala.collection.mutable.Buffer.empty[(Long, Long)]
      rows.foreach { r => cur += ((r.pri, r.id)) }
      val kept = cur.distinct.sortBy(identity).take(k)
      st.update(Minima(kept.map(_._1).toArray, kept.map(_._2).toArray))
      Iterator.single(
        MinimaOut(key, kept.map(_._1).toArray, kept.map(_._2).toArray))
    }
  }

  /** Wire the processor over a (shard, pri, id) stream. */
  def perShardMinima(rows: Dataset[RowIn], k: Int): Dataset[MinimaOut] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(_.shard)
      .transformWithState(
        new BottomKProcessor(k, Encoders.product[Minima]),
        TimeMode.ProcessingTime(),
        OutputMode.Append())
  }
}
