package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** One-pass kernels over raw binary payloads — the media-column
  * analog of [[TextSketchKernels]]. Callable from generated code.
  */
object BinarySketchKernels {

  /** Rolling Horner hashes (base 257, NO modulus) of every w-byte
    * window, mod-hash-sampled 1-in-sampleMod. Base 257 > the byte
    * alphabet (256) makes the map INJECTIVE on w-byte windows —
    * distinct windows get distinct hashes, so sampled-shingle Jaccard
    * estimates the true byte-gram Jaccard without systematic
    * collision bias (the earlier base 31 < 256 collided e.g. [1,0]
    * with [0,31], inflating similarity by construction). The no-mod
    * long bound caps w at 7: max = 255·(257⁷−1)/256 ≈ 7.4e16 < 2⁶³.
    * Exact integer arithmetic end to end, so the DuckDB oracle
    * replays every value from the hex rendering. One O(n) pass, no
    * string materialization — the interpreted HOF rendering over
    * per-char substr was O(n²) per doc (UTF8String.substring scans
    * from the start) and measured minutes at sf0.01; this kernel is
    * the reason the operator is a native expression.
    */
  def shingleHashes(bytes: Array[Byte], w: Int, sampleMod: Int): GenericArrayData = {
    val n = bytes.length
    if (n < w) return new GenericArrayData(Array.emptyLongArray)
    var pow = 1L // 257^(w-1)
    var j = 1
    while (j < w) { pow *= 257L; j += 1 }
    val out = new scala.collection.mutable.ArrayBuilder.ofLong
    var h = 0L
    var i = 0
    while (i < w) { h = h * 257L + (bytes(i) & 0xFF); i += 1 }
    if (h % sampleMod == 0) out += h
    while (i < n) {
      h = (h - (bytes(i - w) & 0xFF) * pow) * 257L + (bytes(i) & 0xFF)
      if (h % sampleMod == 0) out += h
      i += 1
    }
    new GenericArrayData(out.result())
  }

  /** Content-defined chunking (the storage-dedup primitive behind
    * FastCDC/rsync): cut the payload wherever the rolling w-byte
    * base-257 window hash ≡ 0 (mod maskMod) — boundaries follow
    * CONTENT, so an insertion shifts only the chunk it lands in,
    * unlike fixed-size blocks where one byte shifts every boundary.
    * maskMod must not absorb the base: 257 ≡ 1 (mod 2^k) for every
    * k ≤ 8, so a power-of-two mask collapses the cut rule to
    * "window byte-sum ≡ 0" — near-degenerate on periodic/ASCII
    * content (measured: a repeated 45-byte phrase produced ZERO
    * cuts). Use a prime near the target chunk size (default 61);
    * the expression rejects masks with 257 ≡ 1 (mod maskMod).
    * Deliberately NO min/max chunk clamp: a clamp makes each cut
    * depend on the previous one (sequential state the SQL oracle
    * could not replay); with pure per-position cuts the boundary set
    * is position-independent and the whole chunking replays as list
    * arithmetic. Expected chunk length ≈ maskMod bytes.
    *
    * Returns one packed long per chunk: (len << 32) | fingerprint,
    * fingerprint = Horner base-257 fold of the chunk bytes mod
    * 1 000 000 007 (< 2³⁰, exact), len < 2³¹. One O(n) pass.
    */
  def cdcChunks(bytes: Array[Byte], w: Int, maskMod: Int): GenericArrayData = {
    val n = bytes.length
    val P = 1000000007L
    def fp(from: Int, until: Int): Long = {
      var h = 0L
      var i = from
      while (i < until) { h = (h * 257L + (bytes(i) & 0xFF)) % P; i += 1 }
      h
    }
    val out = new scala.collection.mutable.ArrayBuilder.ofLong
    if (n == 0) return new GenericArrayData(Array.emptyLongArray)
    if (n < w) {
      out += (n.toLong << 32) | fp(0, n)
      return new GenericArrayData(out.result())
    }
    var pow = 1L // 257^(w-1), exact through w = 7 (shingle bound)
    var j = 1
    while (j < w) { pow *= 257L; j += 1 }
    var h = 0L
    var i = 0
    while (i < w) { h = h * 257L + (bytes(i) & 0xFF); i += 1 }
    var start = 0
    // cut AFTER window-end position i-1 when the window hash matches
    if (h % maskMod == 0) { out += ((i - start).toLong << 32) | fp(start, i); start = i }
    while (i < n) {
      h = (h - (bytes(i - w) & 0xFF) * pow) * 257L + (bytes(i) & 0xFF)
      i += 1
      if (h % maskMod == 0) {
        out += ((i - start).toLong << 32) | fp(start, i)
        start = i
      }
    }
    if (start < n) out += ((n - start).toLong << 32) | fp(start, n)
    new GenericArrayData(out.result())
  }
}

/** Native sampled w-byte shingle hashes of a binary payload (see
  * kernel doc). Output: array<long>, windows in order, 1-in-sampleMod
  * mod-hash sampled; callers dedupe with array_distinct.
  */
case class BinaryShingleHashes(child: Expression, w: Int, sampleMod: Int)
    extends UnaryExpression {
  // injective-Horner long bound (kernel doc): 255·(257^w − 1)/256 < 2^63
  // holds through w = 7; w = 8 silently wraps
  require(w >= 1 && w <= 7,
    s"binary_shingle_hashes: w must be in [1, 7] (base-257 exact-long bound), got $w")
  require(sampleMod >= 1, s"sampleMod must be >= 1, got $sampleMod")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a binary input")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    BinarySketchKernels.shingleHashes(input.asInstanceOf[Array[Byte]], w,
      sampleMod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.BinarySketchKernels.shingleHashes($c, $w, $sampleMod)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "binary_shingle_hashes"
}

object BinaryShingleHashes {
  def apply(c: Column, w: Int, sampleMod: Int): Column =
    GraftColumnBridge.toColumn(
      BinaryShingleHashes(GraftColumnBridge.toExpr(c), w, sampleMod))
}

/** Native content-defined chunking (see [[BinarySketchKernels.cdcChunks]]):
  * array<long> of (len << 32) | fp packed chunks, in payload order.
  */
case class BinaryCdcChunks(child: Expression, w: Int, maskMod: Int)
    extends UnaryExpression {
  require(w >= 1 && w <= 7,
    s"binary_cdc_chunks: w must be in [1, 7] (base-257 exact-long bound), got $w")
  require(maskMod >= 2, s"maskMod must be >= 2, got $maskMod")
  // 257 ≡ 1 (mod m) turns the rolling hash into a plain byte-sum mod m
  // (kernel doc) — power-of-two masks all hit this
  require(257 % maskMod != 1,
    s"binary_cdc_chunks: maskMod=$maskMod absorbs the base (257 ≡ 1 mod " +
      s"$maskMod) — the cut rule degenerates to a byte-sum; use a prime " +
      s"near the target chunk size (e.g. 61)")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a binary input")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    BinarySketchKernels.cdcChunks(input.asInstanceOf[Array[Byte]], w, maskMod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.BinarySketchKernels.cdcChunks($c, $w, $maskMod)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "binary_cdc_chunks"
}

object BinaryCdcChunks {
  def apply(c: Column, w: Int, maskMod: Int): Column =
    GraftColumnBridge.toColumn(
      BinaryCdcChunks(GraftColumnBridge.toExpr(c), w, maskMod))
}
