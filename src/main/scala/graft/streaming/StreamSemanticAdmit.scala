package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{
  OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming semantic admission — the ingest face of
  * `Similarity.semanticDedup`: an arriving embedding is ADMITTED iff
  * no previously-admitted exemplar in its LSH bucket sits at cosine ≥
  * `minCosine`; paraphrase-level arrivals of already-held content are
  * turned away at the door instead of being swept later. The batch
  * operator dedups a corpus against itself; this one dedups an
  * unbounded stream against what the stream has already let in.
  *
  * Keys shard on the LSH bucket (the same seeded-hyperplane blocking
  * as the batch path — bucket upstream with `Similarity.lshBucket` so
  * stream and corpus agree bit-for-bit), so state and compares scale
  * out with executors. Per-bucket state is ONE ValueState holding up
  * to `maxExemplars` admitted vectors with a native TTL: memory is
  * bounded by maxExemplars·dim doubles per bucket, and a bucket at
  * cap still REJECTS near-dups of its exemplars but admits novel
  * arrivals without storing them — the streaming rendering of the
  * batch hot-bucket star cap (comparisons stay bounded; the exemplar
  * set is the star's hub).
  *
  * Determinism: within a micro-batch a bucket's arrivals process in
  * vec_id order (the batch is buffered per key anyway — bounded by
  * the trigger size, same contract as StreamWinsorize); the cosine is
  * the ordered double fold of VecCosine. Re-running the same batches
  * through the same checkpoint replays identical admissions.
  *
  * Requires the RocksDB state store provider (transformWithState
  * prerequisite), like every operator in this package.
  */
object StreamSemanticAdmit {

  case class VecIn(bucket: Long, vec_id: Long, vec: Array[Double])

  /** admitted=false rows report the admission-order-earliest exemplar
    * achieving the maximal cosine; admitted=true rows carry the max
    * cosine seen (margin to the nearest exemplar; 0.0 in an empty
    * bucket) and matched_id = -1.
    */
  case class AdmitOut(bucket: Long, vec_id: Long, admitted: Boolean,
      matched_id: Long, cos: Double)

  // public: state encoder codegen reads fields reflectively
  case class Exemplars(ids: Array[Long], vecs: Array[Array[Double]])

  /** Ordered left fold, bitwise identical to VecCosine / the DuckDB
    * list_reduce oracles. A zero-norm vector yields NaN cosine, which
    * compares false against any threshold — i.e. zero vectors always
    * ADMIT and, if stored, never reject anyone (same semantics as the
    * batch vec_cosine); filter degenerate vectors upstream.
    */
  def cosine(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    dot / math.sqrt(na * nb)
  }

  /** Encoder derived on the driver and shipped in (reflection inside
    * init() on executor threads can deadlock — see StreamDedup).
    */
  class AdmitProcessor(
      minCosine: Double,
      maxExemplars: Int,
      ttl: java.time.Duration,
      stateEnc: org.apache.spark.sql.Encoder[Exemplars])
      extends StatefulProcessor[Long, VecIn, AdmitOut] {

    @transient private var ex: ValueState[Exemplars] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      ex = getHandle.getValueState[Exemplars]("exemplars", stateEnc,
        TTLConfig(ttl))

    override def handleInputRows(
        key: Long,
        rows: Iterator[VecIn],
        timerValues: TimerValues): Iterator[AdmitOut] = {
      var cur = if (ex.exists()) ex.get()
        else Exemplars(Array.empty, Array.empty)
      var dirty = false
      val out = Seq.newBuilder[AdmitOut]
      // vec_id order: partitioning- and replay-invariant within the
      // micro-batch (buffer bounded by the trigger size)
      rows.toArray.sortBy(_.vec_id).foreach { r =>
        var best = 0.0
        var bestIdx = -1
        var i = 0
        while (i < cur.ids.length) {
          val c = cosine(cur.vecs(i), r.vec)
          if (bestIdx < 0 || c > best) { best = c; bestIdx = i }
          i += 1
        }
        if (bestIdx >= 0 && best >= minCosine) {
          out += AdmitOut(key, r.vec_id, admitted = false,
            cur.ids(bestIdx), best)
        } else {
          out += AdmitOut(key, r.vec_id, admitted = true, -1L,
            if (bestIdx >= 0) best else 0.0)
          if (cur.ids.length < maxExemplars) {
            cur = Exemplars(cur.ids :+ r.vec_id, cur.vecs :+ r.vec)
            dirty = true
          }
        }
      }
      if (dirty) ex.update(cur)
      out.result().iterator
    }
  }

  /** Wire the processor over a stream keyed by LSH bucket. */
  def admit(
      vecs: Dataset[VecIn],
      minCosine: Double,
      maxExemplars: Int,
      ttl: java.time.Duration): Dataset[AdmitOut] = {
    import vecs.sparkSession.implicits._
    vecs.groupByKey(_.bucket)
      .transformWithState(
        new AdmitProcessor(minCosine, maxExemplars, ttl,
          Encoders.product[Exemplars]),
        TimeMode.ProcessingTime(),
        OutputMode.Append())
  }
}
