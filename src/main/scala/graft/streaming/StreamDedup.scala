package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{
  OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming first-seen deduplication on Spark 4's transformWithState
  * (the arbitrary-state API succeeding flatMapGroupsWithState): the
  * ingest-side complement of the batch dedup suite — documents whose
  * fingerprint was already seen inside the TTL horizon are dropped (or
  * emitted as duplicates with a count, for audit).
  *
  * State is one ValueState[FirstSeen] per fingerprint with a native
  * state-TTL (the state store itself expires entries — no timer
  * bookkeeping, no unbounded growth: exactly what a 100 TB/day ingest
  * needs; `dropDuplicatesWithinWatermark` covers only the watermark
  * window and cannot report counts). Keys shard across executors on
  * the fingerprint; RocksDB holds the working set off-heap.
  *
  * Requires the RocksDB state store provider
  * (spark.sql.streaming.stateStore.providerClass =
  * ...state.RocksDBStateStoreProvider), the transformWithState
  * prerequisite.
  */
object StreamDedup {

  case class DocIn(fingerprint: Long, doc_id: Long, ts: java.sql.Timestamp)

  /** first=true rows are the survivors; first=false rows report the
    * n-th duplicate (n = nSeen) against the surviving doc.
    */
  case class DedupOut(
      fingerprint: Long,
      doc_id: Long,
      first: Boolean,
      first_doc_id: Long,
      nSeen: Long)

  // public: the state encoder's generated code accesses the fields
  // reflectively from Janino-compiled classes
  case class FirstSeen(docId: Long, n: Long)

  /** The state encoder is derived ON THE DRIVER (at plan build) and
    * shipped in: Encoders.product runs Scala runtime reflection, and
    * doing that inside init() — i.e. on executor task threads — can
    * deadlock the global reflection lock against executor-classloader
    * class fetches.
    */
  class FirstSeenProcessor(
      ttl: java.time.Duration,
      stateEnc: org.apache.spark.sql.Encoder[FirstSeen])
      extends StatefulProcessor[Long, DocIn, DedupOut] {

    @transient private var seen: ValueState[FirstSeen] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState[FirstSeen](
        "seen", stateEnc, TTLConfig(ttl))

    override def handleInputRows(
        key: Long,
        rows: Iterator[DocIn],
        timerValues: TimerValues): Iterator[DedupOut] = {
      val out = Seq.newBuilder[DedupOut]
      rows.foreach { d =>
        if (!seen.exists()) {
          seen.update(FirstSeen(d.doc_id, 1L))
          out += DedupOut(key, d.doc_id, first = true, d.doc_id, 1L)
        } else {
          val s = seen.get()
          seen.update(s.copy(n = s.n + 1))
          out += DedupOut(key, d.doc_id, first = false, s.docId, s.n + 1)
        }
      }
      out.result().iterator
    }
  }

  /** Wire the processor over a stream keyed by fingerprint. */
  def firstSeen(
      docs: Dataset[DocIn],
      ttl: java.time.Duration): Dataset[DedupOut] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.fingerprint)
      .transformWithState(
        new FirstSeenProcessor(ttl, Encoders.product[FirstSeen]),
        TimeMode.ProcessingTime(),
        OutputMode.Append())
  }
}
