package graft.expressions

import java.util.zip.Deflater

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deflate compression ratio in MILLI units (compressed·1000 div
  * raw bytes) — the real-world compressibility quality gate (used by
  * C4/Gopher-family pipelines to drop boilerplate and generated
  * spam: highly repetitive text compresses far below natural prose).
  *
  * Fixed Deflater(level 6, raw deflate, no dict) over the UTF-8
  * bytes; integer milli output so thresholds are exact. Deterministic
  * for a given zlib implementation (the JDK bundles its own), but NOT
  * a cross-engine-stable value — DuckDB has no deflate — so this
  * expression is SPEC-GATED (properties + within-engine determinism),
  * not oracled; the oracle-exact siblings are TextEntropy (char
  * distribution) and TextRepetition (n-gram duplication).
  *
  * Empty input → 1000 (ratio 1.0). Single pass, one reused scratch
  * buffer per eval; codegen'd.
  */
object DeflateRatioImpl {

  def ratioMilli(s: UTF8String): Long = {
    val raw = s.getBytes
    if (raw.length == 0) return 1000L
    val d = new Deflater(6, true)
    try {
      d.setInput(raw)
      d.finish()
      val buf = new Array[Byte](raw.length + 64)
      var total = 0L
      while (!d.finished()) {
        val k = d.deflate(buf)
        if (k == 0 && !d.finished()) return 1000L // defensive; cannot stall post-finish
        total += k
      }
      total * 1000L / raw.length
    } finally d.end()
  }
}

case class DeflateRatio(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input")

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    DeflateRatioImpl.ratioMilli(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.DeflateRatioImpl.ratioMilli($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "deflate_ratio_milli"
}

object DeflateRatio {
  def apply(c: Column): Column =
    GraftColumnBridge.toColumn(DeflateRatio(GraftColumnBridge.toExpr(c)))
}
