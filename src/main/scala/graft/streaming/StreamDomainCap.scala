package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{
  OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming per-domain admission cap — the ingest face of
  * `Sampling.groupCapSample` (cap docs per domain/source so
  * mega-domains can't own the mixture), on transformWithState.
  *
  * Semantics — prefix-greedy priority admission: each micro-batch
  * ranks a key's rows by the SAME deterministic affine-hash priority
  * as the batch operator (`Sampling.hashBucketLong`, key tie-break)
  * and admits the best `cap − admittedSoFar` of them; state is ONE
  * counter per domain. Consequences, both spec-proven:
  *   - a single AvailableNow pass over a static table is EXACTLY
  *     `groupCapSample` (one batch ⇒ greedy = global);
  *   - across batches the cap is never exceeded and earlier
  *     admissions are never retracted — a stream cannot un-emit, so
  *     a later row with better priority than an admitted one is
  *     dropped. That greedy gap is the documented trade; the batch
  *     operator is the recompute path when exact global priority
  *     matters (same audit-vs-scale pairing as profile/profileSketch).
  *
  * MEMORY CONTRACT: like StreamWinsorize, one key's micro-batch rows
  * buffer in executor memory for the ranking (O(trigger size), not
  * O(stream history)); long-run state is the single admitted-count
  * long per domain — strictly bounded.
  */
object StreamDomainCap {

  case class DocIn(host: String, doc_id: Long)
  case class AdmitOut(host: String, doc_id: Long)

  class CapProcessor(cap: Int, stateEnc: org.apache.spark.sql.Encoder[Long])
      extends StatefulProcessor[String, DocIn, AdmitOut] {

    @transient private var admitted: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      admitted = getHandle.getValueState[Long](
        "admitted", stateEnc, TTLConfig.NONE)

    override def handleInputRows(
        key: String,
        rows: Iterator[DocIn],
        timerValues: TimerValues): Iterator[AdmitOut] = {
      val have = if (admitted.exists()) admitted.get() else 0L
      val room = (cap - have).toInt
      if (room <= 0) { rows.foreach(_ => ()); return Iterator.empty }
      val best = rows.toArray
        .sortBy(d => (graft.operators.Sampling.hashBucketLong(d.doc_id, 1000000),
          d.doc_id))
        .take(room)
      admitted.update(have + best.length)
      best.iterator.map(d => AdmitOut(key, d.doc_id))
    }
  }

  /** Wire the processor over a stream keyed by host. */
  def admit(docs: Dataset[DocIn], cap: Int): Dataset[AdmitOut] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.host)
      .transformWithState(
        new CapProcessor(cap, Encoders.scalaLong),
        TimeMode.ProcessingTime(),
        OutputMode.Append())
  }
}
