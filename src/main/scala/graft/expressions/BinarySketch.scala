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

  /** Rolling Horner hashes (base 31, NO modulus — for w=8 over
    * unsigned bytes the maximum is Σ 255·31^j < 2^43, exact in a
    * long) of every w-byte window, mod-hash-sampled 1-in-sampleMod.
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
    var pow = 1L // 31^(w-1)
    var j = 1
    while (j < w) { pow *= 31L; j += 1 }
    val out = new scala.collection.mutable.ArrayBuilder.ofLong
    var h = 0L
    var i = 0
    while (i < w) { h = h * 31L + (bytes(i) & 0xFF); i += 1 }
    if (h % sampleMod == 0) out += h
    while (i < n) {
      h = (h - (bytes(i - w) & 0xFF) * pow) * 31L + (bytes(i) & 0xFF)
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
