package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{ShiftLeft, ShiftRight}
import org.apache.spark.sql.functions._

/** Bloom-filter join pruning: drop fact rows that cannot match the
  * build side BEFORE the join shuffle.
  *
  * At 100 TB the dominant cost of `fact ⋈ dim-subset` is shuffling
  * fact rows whose keys aren't in the subset at all. A Bloom filter of
  * the build keys, probed map-side on the fact scan, eliminates most
  * of them for the price of a scan-local expression — the same idea as
  * Spark's AQE runtime bloom filter (`spark.sql.optimizer.runtime.
  * bloomFilter.enabled`), made explicit, deterministic, and portable.
  * False positives are fine: the exact join afterwards removes them,
  * so the RESULT is identical to the plain join (which is exactly what
  * the oracle checks — the bloom is performance-only by construction).
  *
  * Everything composes from built-ins, no UDF:
  *   - probe positions by double hashing (Kirsch–Mitzenmatcher):
  *     pos_i = (h1 + i·h2) mod m with h1,h2 = xxhash64 under two seeds
  *     — k codegen'd probes per row;
  *   - the bitset is built DISTRIBUTIVELY: positions → (word, mask) →
  *     groupBy(word).agg(bit_or) — one map-side-combining shuffle of
  *     ≤ m/64 rows; only the finished m/64-long word array reaches the
  *     driver (16 KiB at the default m=2²⁰), the key set never does.
  *     Same regime as Spark's own runtime filter, which caps its
  *     creation side (default 10 MB) for the same reason: the build
  *     side of a pruning filter must be small; the PROBE side is the
  *     100 TB one.
  */
object BloomPrune {

  /** Word count for m bits. */
  private def words(mBits: Int): Int = {
    require(mBits % 64 == 0, "mBits must be a multiple of 64")
    mBits / 64
  }

  /** The i-th probe position for `key` (0 ≤ pos < mBits). The long
    * cast is load-bearing: xxhash64 dispatches on input type (an INT
    * key would hash differently), and the native probe expression
    * (graft.expressions.BloomContains) replicates exactly the
    * hash-a-long chain.
    */
  private def pos(key: Column, i: Int, mBits: Int): Column = {
    val k = key.cast("long")
    val h1 = xxhash64(k)
    val h2 = xxhash64(k, lit(graft.expressions.BloomContains.SeedMix))
    // reduce mod 2^31-1 before combining (r13 ANSI profile): every
    // intermediate stays < 2^35, so the chain is overflow-free under
    // ANSI too — MUST stay byte-identical to BloomContains.contains
    val q = lit(graft.expressions.BloomContains.HashMod)
    pmod(pmod(h1, q) + lit(i.toLong) * pmod(h2, q), lit(mBits.toLong))
  }

  // the functions-API shiftleft/shiftright only take an Int literal
  // shift; the underlying catalyst expressions take any column
  private def shl(a: Column, b: Column): Column =
    GraftColumnBridge.toColumn(ShiftLeft(
      GraftColumnBridge.toExpr(a), GraftColumnBridge.toExpr(b)))
  private def shr(a: Column, b: Column): Column =
    GraftColumnBridge.toColumn(ShiftRight(
      GraftColumnBridge.toExpr(a), GraftColumnBridge.toExpr(b)))

  /** Build the bitset from the distinct keys of `dim(keyCol)`.
    * Distributed until the last step; the returned array is m/64
    * longs regardless of key count.
    */
  def buildBits(dim: DataFrame, keyCol: String, mBits: Int = 1 << 20,
      k: Int = 5): Array[Long] = {
    val nw = words(mBits)
    val key = col(keyCol)
    val positions = dim
      .filter(key.isNotNull)
      .select(explode(array((0 until k).map(i => pos(key, i, mBits)): _*))
        .as("p"))
    val wordRows = positions
      .select((col("p") / 64).cast("int").as("w"),
        shl(lit(1L), (col("p") % 64).cast("int")).as("mask"))
      .groupBy("w").agg(bit_or(col("mask")).as("bits"))
      .collect()
    val bits = new Array[Long](nw)
    wordRows.foreach(r => bits(r.getInt(0)) = r.getLong(1))
    bits
  }

  /** Probe: true iff all k bits for `key` are set. Composes to k
    * element_at/shiftright/bit-and triples — all codegen'd, no UDF.
    * NULL keys yield NULL (filtered out, matching inner-join
    * semantics).
    */
  def mightContain(key: Column, bits: Array[Long], k: Int = 5): Column = {
    val mBits = bits.length * 64
    val arr = typedlit(bits.toSeq)
    (0 until k).map { i =>
      val p = pos(key, i, mBits)
      (shr(element_at(arr, (p / 64).cast("int") + 1),
        (p % 64).cast("int")).bitwiseAND(lit(1L))) === 1L
    }.reduce(_ && _)
  }

  /** Native single-pass probe (graft.expressions.BloomContains): two
    * hashes + ≤k bit tests per row vs the composed rendering's 2k
    * hashes — the version the hot scan path should run.
    */
  def mightContainNative(key: Column, bits: Array[Long], k: Int = 5): Column =
    graft.expressions.BloomContains(key.cast("long"), bits, k)

  /** `fact ⋈ dim` on `factKey = dimKey`, with the fact side
    * bloom-pruned before the shuffle. Result-identical to the plain
    * inner join; the bloom only cuts shuffle width.
    */
  def prunedJoin(fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String,
      mBits: Int = 1 << 20, k: Int = 5): DataFrame = {
    val bits = buildBits(dim, dimKey, mBits, k)
    fact
      .filter(mightContainNative(col(factKey), bits, k))
      .join(dim, col(factKey) === col(dimKey))
  }
}
