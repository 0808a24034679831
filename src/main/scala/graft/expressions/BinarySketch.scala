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
