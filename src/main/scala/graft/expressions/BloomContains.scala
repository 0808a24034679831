package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/** Native Bloom-filter membership probe over a LONG key.
  *
  * The composed-builtins rendering ([[graft.operators.BloomPrune
  * .mightContain]]) evaluates `xxhash64` twice PER PROBE — 2k hashes
  * per row on the hot scan path. This expression computes the two
  * base hashes once and derives all k positions (Kirsch–Mitzenmacher
  * double hashing), short-circuiting on the first clear bit: 2 hashes
  * + ≤k O(1) bit tests per row, codegen'd to a static call with the
  * bitset as a referenced object (not a 16 KiB array literal in the
  * generated source).
  *
  * Hash parity with the builder: `h1 = xxhash64(key)`, `h2 =
  * xxhash64(key, SeedMix)` — byte-identical to the Column-API calls
  * BloomPrune.buildBits makes (xxhash64 chains the seed through its
  * arguments; replicated here via XxHash64Function.hashLong), so a
  * bitset built by either side probes correctly with the other —
  * asserted in BloomPruneSpec.
  */
case class BloomContains(child: Expression, bits: Array[Long], k: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires bigint")

  override def dataType: DataType = BooleanType

  override def nullSafeEval(input: Any): Any =
    BloomContains.contains(input.asInstanceOf[Long], bits, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bitsRef = ctx.addReferenceObj("bloomBits", bits, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"${BloomContains.getClass.getName.stripSuffix("$")}.contains($c, $bitsRef, $k)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "bloom_contains"

  // Case-class equals/hashCode on an Array field are reference-based,
  // which silently defeats semanticEquals-driven subexpression
  // elimination and plan-fragment reuse (two identical probes would
  // never compare equal). Compare the bitset by value instead.
  override def equals(other: Any): Boolean = other match {
    case BloomContains(c, b, kk) =>
      c == child && kk == k && java.util.Arrays.equals(b, bits)
    case _ => false
  }

  override def hashCode(): Int =
    java.util.Objects.hash(child, Integer.valueOf(k),
      Integer.valueOf(java.util.Arrays.hashCode(bits)))
}

object BloomContains {

  /** Second-hash seed mix — the same constant BloomPrune feeds to
    * xxhash64 as a second argument.
    */
  val SeedMix = 0x9e3779b97f4a7c15L

  /** Double-hash reduction modulus (r13 ANSI profile): the classic
    * `(h1 + i·h2) mod 2^64` chain wraps by design, which the BUILDER's
    * Column rendering cannot express under ANSI mode (long-overflow
    * raise). Reducing both hashes mod 2^31−1 FIRST keeps every
    * intermediate below 2^35 — overflow-free in either engine mode —
    * and Kirsch–Mitzenmacher double hashing is unaffected for
    * m ≪ 2^31. Builder (BloomPrune.pos) and this prober must use the
    * IDENTICAL chain.
    */
  val HashMod = 2147483647L

  /** Called from eval and generated code. */
  def contains(key: Long, bits: Array[Long], k: Int): Boolean = {
    val mBits = bits.length.toLong * 64L
    val h1 = XXH64.hashLong(key, 42L)
    val h2 = XXH64.hashLong(SeedMix, h1)
    // pmod semantics, mirrored by the builder's pmod(h, HashMod)
    val r1 = ((h1 % HashMod) + HashMod) % HashMod
    val r2 = ((h2 % HashMod) + HashMod) % HashMod
    var i = 0
    while (i < k) {
      val pos = (r1 + i.toLong * r2) % mBits
      if (((bits((pos / 64L).toInt) >>> (pos % 64L).toInt) & 1L) == 0L)
        return false
      i += 1
    }
    true
  }

  def apply(key: Column, bits: Array[Long], k: Int): Column =
    GraftColumnBridge.toColumn(
      BloomContains(GraftColumnBridge.toExpr(key), bits, k))
}
