package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native MinHash signature: k permutation minima over pre-hashed
  * shingles (array<long>, produced by the codegen'd built-in
  * `xxhash64` + `pmod`), in one compiled k×n loop.
  *
  * The composable rendering (Dedup.minhashSignature) builds k
  * interpreted `array_min(transform(...))` branches — ~64·n lambda
  * invocations per row with an allocated intermediate array each.
  * Values are identical: same (a_i·x + b_i) mod P permutations from
  * the same seeded coefficient stream.
  */
case class MinHashSig(child: Expression, k: Int, seed: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> of base hashes, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // same coefficient stream as Dedup.minhashSignature and the oracle
  @transient private lazy val coefs: (Array[Long], Array[Long]) =
    MinHashSig.coefficients(k, seed)

  /** One fused loop; called from both eval and generated code. */
  def compute(input: ArrayData): ArrayData = {
    val (as, bs) = coefs
    val mins = Array.fill(k)(Long.MaxValue)
    val n = input.numElements()
    var j = 0
    while (j < n) {
      val x = input.getLong(j)
      var i = 0
      while (i < k) {
        val v = (x * as(i) + bs(i)) % MinHashSig.P
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhashSig", this, classOf[MinHashSig].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}

object MinHashSig {
  val P: Long = 1000000007L

  /** Column API over raw shingle strings: base-hash with the built-in
    * codegen'd xxhash64 (seed 42, Spark default), then the native k-min
    * loop. Drop-in for Dedup.minhashSignature.
    */
  def ofShingles(shingles: Column, k: Int = 64, seed: Long = 42L): Column = {
    import org.apache.spark.sql.functions._
    val base = transform(shingles, s => pmod(xxhash64(s), lit(P)))
    GraftColumnBridge.toColumn(
      MinHashSig(GraftColumnBridge.toExpr(base), k, seed))
  }

  /** Over pre-hashed shingles (e.g. the native TextShingleHashes poly
    * fold — the DuckDB-replayable base). Duplicate base hashes don't
    * change a min, so distinct and ordered shingle sets give the same
    * signature.
    */
  def ofHashes(base: Column, k: Int = 64, seed: Long = 42L): Column =
    GraftColumnBridge.toColumn(
      MinHashSig(GraftColumnBridge.toExpr(base), k, seed))

  /** The (a_i, b_i) permutation coefficients for a given (k, seed) —
    * exposed so oracle SQL can inline the identical stream.
    */
  def coefficients(k: Int, seed: Long = 42L): (Array[Long], Array[Long]) = {
    val rnd = new scala.util.Random(seed)
    val as = new Array[Long](k)
    val bs = new Array[Long](k)
    var i = 0
    while (i < k) {
      as(i) = 1 + rnd.nextLong(P - 1)
      bs(i) = rnd.nextLong(P)
      i += 1
    }
    (as, bs)
  }
}

/** One-permutation MinHash with rotation densification (Li, Owen &
  * Zhang NIPS'12; Shrivastava & Li ICML'14): ONE permutation
  * v = (a·x + b) mod P over the base hashes, the permuted range split
  * into k equal bins (bin = ⌊v·k/P⌋), slot i = min v landing in bin i;
  * an EMPTY bin borrows circularly from the nearest non-empty bin to
  * its right (wrapping), offset by distance·P so borrowed slots stay
  * distinguishable across distances (the C-offset of the densified
  * scheme — C = P ≥ any permuted value keeps the argmin = nearest).
  *
  * Why it exists beside [[MinHashSig]]: the classic signature is a
  * k×n loop — every shingle hashed k times. OPH is O(n + k): one
  * multiply-add per shingle plus a k-sized densify pass, the
  * published ~k-fold signature-build cost cut that matters when the
  * build scan IS the dedup bill at corpus scale. Same downstream
  * banding/cap/verify pipeline; slot agreement is still an unbiased
  * Jaccard estimator (densified slots borrow uniformly-random bins).
  *
  * Exact replay: the whole chain is integer arithmetic on the shared
  * base hashes, and the densify rule has a closed form the oracle
  * renders directly — slot i = min over j∈[0,k) of
  * (binmin[(i+j) mod k] + j·P), NULL bins skipped. A doc with zero
  * shingles yields Long.MaxValue slots (the classic kernel's empty
  * convention).
  */
case class OnePermMinHash(child: Expression, k: Int, seed: Long)
    extends UnaryExpression {

  // k = bin count = signature width; k ≤ 64 keeps bin = ⌊v·k/P⌋ free
  // of Long overflow (v < P ≈ 2^30, so v·k < 2^36).
  require(k > 0 && k <= 64, s"OnePermMinHash k must be in [1, 64], got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> of base hashes, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // the ONE permutation: head of the shared coefficient stream, so
  // the oracle inlines the identical (a, b)
  @transient private lazy val perm: (Long, Long) = {
    val (as, bs) = MinHashSig.coefficients(1, seed)
    (as(0), bs(0))
  }

  def compute(input: ArrayData): ArrayData = {
    val (a, b) = perm
    val p = MinHashSig.P
    val mins = Array.fill(k)(Long.MaxValue) // MaxValue ⇔ empty bin
    val n = input.numElements()
    var j = 0
    while (j < n) {
      // the [0,P) input contract holds for the house base hashes, but
      // the public SQL surface (one_perm_minhash) can receive raw
      // xxhash64 — wrap non-negative so an out-of-contract negative
      // input degrades to a valid (different) permutation instead of
      // crashing on a negative bin index. In-contract inputs are
      // unchanged: x,a,b ∈ [0,P) ⇒ x·a+b ≥ 0 ⇒ the +p wrap is a no-op,
      // so the oracle's closed form replays identically.
      val v = ((input.getLong(j) * a + b) % p + p) % p
      val bin = ((v * k) / p).toInt // v < P, k ≤ 64 ⇒ no overflow
      if (v < mins(bin)) mins(bin) = v
      j += 1
    }
    // O(k) circular scan: dist(i) = smallest j ≥ 0 with bin (i+j) mod k
    // non-empty (two backward laps cover the wrap); then
    // out(i) = mins((i+dist) mod k) + dist·P — the closed-form argmin
    // of the rotation-densified borrow.
    val dist = new Array[Int](k)
    java.util.Arrays.fill(dist, Int.MaxValue)
    var d = Int.MaxValue
    var i = 2 * k - 1
    while (i >= 0) {
      val ii = i % k
      if (mins(ii) != Long.MaxValue) d = 0
      else if (d != Int.MaxValue) d += 1
      if (i < k) dist(ii) = d
      i -= 1
    }
    val out = new Array[Long](k)
    i = 0
    while (i < k) {
      out(i) =
        if (dist(i) == Int.MaxValue) Long.MaxValue // zero shingles
        else mins((i + dist(i)) % k) + dist(i).toLong * p
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ophSig", this, classOf[OnePermMinHash].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "one_perm_minhash"
}

object OnePermMinHash {
  /** Over pre-hashed shingles (the native TextShingleHashes poly fold
    * — the DuckDB-replayable base). Duplicate base hashes can't change
    * a bin min, so distinct and raw shingle lists agree.
    */
  def ofHashes(base: Column, k: Int = 64, seed: Long = 42L): Column =
    GraftColumnBridge.toColumn(
      OnePermMinHash(GraftColumnBridge.toExpr(base), k, seed))
}
