package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{
  MapState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Streaming online winsorization — the streaming face of
  * operators/Stats.winsorize: clamp each event into its group's
  * evolving [p05, p95], where the bounds come from a per-group HDR
  * quantile sketch (operators/Sketch bucket arithmetic, verbatim)
  * maintained as transformWithState MapState.
  *
  * Why a sketch and not the batch selection path: a stream can't
  * re-scan history for exact order statistics, but the HDR bucket
  * state is BOUNDED — ≤ 64·2^(QSubBits-1) entries per group no matter
  * how many events pass — and the bucket key is a pure integer
  * function of the value, so state is replay- and partition-stable,
  * and a batch run over the same prefix computes bit-identical bounds
  * (asserted in StreamWinsorizeSpec against Sketch.quantileEstimates:
  * same ⌈num·n/den⌉ ranks, same midpoint arithmetic — the mergeable-
  * sketch property StreamSketch already proves for the agg family).
  *
  * Each micro-batch: ingest the batch's rows into the sketch, then
  * clamp the batch with bounds INCLUDING those rows — so a single
  * AvailableNow pass over a static table equals the batch-winsorize-
  * with-sketch-bounds rendering, and incremental runs tighten bounds
  * as history accumulates. State shards by group key on the usual
  * RocksDB store.
  *
  * MEMORY CONTRACT: the default include-current-batch semantics force
  * handleInputRows to buffer one key's micro-batch rows in executor
  * memory (`rows.toArray`) before emitting — the clamp bounds depend
  * on every row of the batch, so rows cannot stream through one at a
  * time. Per-key footprint is O(rows of that key in the micro-batch),
  * NOT O(stream history) — the history lives in the bounded bucket
  * sketch. A hot key in a huge micro-batch therefore bounds its
  * memory by the trigger size: cap `maxOffsetsPerTrigger` (or
  * equivalent) accordingly — or use `preBatchBounds = true`.
  *
  * PRE-BATCH VARIANT (`preBatchBounds = true`): bounds are estimated
  * ONCE from the sketch state as of batch start, then rows stream
  * through lazily at O(1) per-key memory (each row ingests into the
  * sketch and clamps against the pinned bounds — no buffering). The
  * trade: a row is clamped by its PREDECESSORS' distribution, not its
  * own batch's, so a single AvailableNow pass no longer equals the
  * batch winsorize (bounds lag one batch), and the FIRST batch of a
  * key passes through unclamped with the sentinel bounds
  * (Long.MinValue, Long.MaxValue) — there is no prior state to clamp
  * against, and inventing bounds from a partial batch would be the
  * buffering variant again. Ingestion rides INSIDE the lazy output
  * iterator, so full consumption is load-bearing for state (the
  * stateful operator drains it; don't splice early-stopping consumers
  * into the processor's output). Right choice for hot-key/huge-trigger
  * regimes where O(batch) buffering is the risk; the spec proves its
  * batch-2 bounds equal the default variant's batch-1-prefix bounds.
  */
object StreamWinsorize {

  import graft.operators.Sketch.QSubBits

  case class EventIn(event_type: String, event_id: Long, cents: Long)
  case class WinsOut(event_type: String, event_id: Long, cents: Long,
      cents_w: Long, lo: Long, hi: Long)

  /** Bucket key e·64 + sub — the integer (bit-width, top-mantissa)
    * bucket of Sketch.quantileSketch, one long. Domain: v ≥ 0, the
    * sketch family's contract (Sketch.scala: "scale money to cents
    * first; shift/offset a signed domain before sketching") — a
    * negative v sign-extends the mantissa shift and breaks bucket
    * ordering, identically to the batch sketch.
    */
  def bucketKey(v: Long): Long = {
    val e = if (v == 0L) 1 else 64 - java.lang.Long.numberOfLeadingZeros(v)
    val sub = v >> math.max(e - QSubBits, 0)
    e.toLong * 64L + sub
  }

  /** Midpoint estimate of a bucket key — same integer arithmetic as
    * Sketch.quantileEstimates' `est` column.
    */
  def bucketMid(bkey: Long): Long = {
    val e = (bkey / 64L).toInt
    val sub = bkey % 64L
    val bs = math.max(e - QSubBits, 0)
    val lo = sub << bs
    val hi = ((sub + 1L) << bs) - 1L
    lo + (hi - lo) / 2L
  }

  class Processor(stateKeyEnc: org.apache.spark.sql.Encoder[Long],
      stateValEnc: org.apache.spark.sql.Encoder[Long],
      preBatchBounds: Boolean = false)
      extends StatefulProcessor[String, EventIn, WinsOut] {

    @transient private var sketch: MapState[Long, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      sketch = getHandle.getMapState[Long, Long](
        "sketch", stateKeyEnc, stateValEnc, TTLConfig.NONE)

    /** ⌈num·n/den⌉-th value estimate over the sketch entries — the
      * first bucket whose cumulative count reaches the rank, in
      * bucket-key order (exactly quantileEstimates' selection).
      */
    private def estimate(entries: Array[(Long, Long)],
        num: Long, den: Long): Long = {
      val n = entries.map(_._2).sum
      val rank = (num * n + den - 1L) / den
      var cum = 0L
      val it = entries.sortBy(_._1).iterator
      while (it.hasNext) {
        val (bk, c) = it.next()
        cum += c
        if (cum >= rank) return bucketMid(bk)
      }
      bucketMid(entries.maxBy(_._1)._1) // n == 0 can't reach here
    }

    private def ingest(cents: Long): Unit = {
      val bk = bucketKey(cents)
      val cur = if (sketch.containsKey(bk)) sketch.getValue(bk) else 0L
      sketch.updateValue(bk, cur + 1L)
    }

    override def handleInputRows(
        key: String,
        rows: Iterator[EventIn],
        timerValues: TimerValues): Iterator[WinsOut] = {
      if (preBatchBounds) {
        // bounds pinned from state AS OF batch start; rows then stream
        // through lazily — O(1) per-key memory (object doc). An empty
        // prior state (first batch of the key) passes through with the
        // sentinel no-clamp bounds.
        // LAZINESS CONTRACT: sketch ingestion happens inside the
        // returned iterator, so FULL consumption is load-bearing for
        // state — Spark's stateful operator drains the iterator before
        // committing state, but an early-stopping consumer spliced
        // downstream (e.g. a local limit) would silently drop the
        // unconsumed tail from the quantile history. The buffering
        // default variant ingests eagerly and has no such coupling.
        val entries = sketch.iterator().map(t => (t._1, t._2)).toArray
        val (lo, hi) =
          if (entries.isEmpty) (Long.MinValue, Long.MaxValue)
          else (estimate(entries, 1L, 20L), estimate(entries, 19L, 20L))
        rows.map { r =>
          ingest(r.cents)
          val w = math.min(math.max(r.cents, lo), hi)
          WinsOut(key, r.event_id, r.cents, w, lo, hi)
        }
      } else {
        val batch = rows.toArray
        batch.foreach(r => ingest(r.cents))
        val entries = sketch.iterator().map(t => (t._1, t._2)).toArray
        val lo = estimate(entries, 1L, 20L)
        val hi = estimate(entries, 19L, 20L)
        batch.iterator.map { r =>
          val w = math.min(math.max(r.cents, lo), hi)
          WinsOut(key, r.event_id, r.cents, w, lo, hi)
        }
      }
    }
  }

  /** Wire the processor over a stream keyed by event_type.
    * `preBatchBounds = true` selects the O(1)-memory pre-batch-bounds
    * variant (object doc: MEMORY CONTRACT / PRE-BATCH VARIANT).
    */
  def clamp(events: Dataset[EventIn],
      preBatchBounds: Boolean = false): Dataset[WinsOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.event_type)
      .transformWithState(
        new Processor(Encoders.scalaLong, Encoders.scalaLong, preBatchBounds),
        TimeMode.ProcessingTime(),
        OutputMode.Append())
  }
}
