package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{
  OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming concat-and-cut sequence layout — the ingest face of
  * `Packing.concatCut` (docs concatenate into a token stream, cut
  * into fixed `seqLen` training windows), on transformWithState.
  *
  * A GLOBAL concat order is inherently sequential, so the streaming
  * rendering shards the stream (the packContiguous decomposition):
  * one running token offset per shard, and each micro-batch lays its
  * shard's docs end-to-end in doc-id order continuing from the stored
  * offset. Consequences, both spec-proven:
  *   - a single AvailableNow pass over one shard is EXACTLY the batch
  *     `Packing.concatCut` layout (same spans, same window ids);
  *   - appending a later batch extends each shard's stream as a pure
  *     SUFFIX: earlier spans never move (a stream cannot re-emit), so
  *     the layout is replay-idempotent from the checkpoint and equals
  *     the batch layout over the union whenever arrival order
  *     respects doc-id order per shard — the append-only ingest
  *     contract. Out-of-order arrival across batches is the
  *     documented trade; batch recompute is the exact path.
  *
  * MEMORY CONTRACT: one shard's micro-batch rows buffer for the
  * in-batch ordering (O(trigger size), not O(stream history));
  * long-run state is ONE long per shard — strictly bounded.
  */
object StreamConcatCut {

  case class DocIn(shard: Int, doc_id: Long, n_toks: Long)
  case class SpanOut(
      shard: Int,
      doc_id: Long,
      start_tok: Long,
      end_tok: Long,
      first_seq: Long,
      last_seq: Long)

  class OffsetProcessor(
      seqLen: Long,
      eosTokens: Int,
      stateEnc: org.apache.spark.sql.Encoder[Long])
      extends StatefulProcessor[Int, DocIn, SpanOut] {

    @transient private var offset: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      offset = getHandle.getValueState[Long]("offset", stateEnc, TTLConfig.NONE)

    override def handleInputRows(
        key: Int,
        rows: Iterator[DocIn],
        timerValues: TimerValues): Iterator[SpanOut] = {
      var off = if (offset.exists()) offset.get() else 0L
      val out = rows.toArray.sortBy(_.doc_id).map { d =>
        val t = d.n_toks + eosTokens
        val start = off
        off += t
        SpanOut(key, d.doc_id, start, start + t - 1,
          start / seqLen, (start + t - 1) / seqLen)
      }
      offset.update(off)
      out.iterator
    }
  }

  /** Wire the processor over a stream keyed by shard. */
  def layout(
      docs: Dataset[DocIn],
      seqLen: Long,
      eosTokens: Int = 1): Dataset[SpanOut] = {
    import docs.sparkSession.implicits._
    require(seqLen > 0)
    docs.groupByKey(_.shard)
      .transformWithState(
        new OffsetProcessor(seqLen, eosTokens, Encoders.scalaLong),
        TimeMode.ProcessingTime(),
        OutputMode.Append())
  }
}
