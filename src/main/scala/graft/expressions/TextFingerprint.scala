package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static helper so generated code can call one tight loop. */
object TextHash {
  val Mod = 1000000007L

  /** Polynomial rolling hash over code points: h = (h*31 + cp) % M —
    * identical to folding `ascii()` over single-character splits (the
    * composable rendering in TextOps.fingerprint and the DuckDB
    * list_reduce oracle).
    */
  def fp(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      acc = (acc * 31L + cp) % Mod
      i += Character.charCount(cp)
    }
    acc
  }
}

/** Native codegen'd rolling-hash fingerprint (see TextOps.fingerprint
  * for the composable HOF rendering — same values, ~10× less per-row
  * work because no per-character string array is materialized).
  */
case class TextFingerprint(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"$prettyName requires a string input")

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    TextHash.fp(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TextHash.fp($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "text_fingerprint"
}

object TextFingerprint {
  def apply(c: Column): Column =
    GraftColumnBridge.toColumn(TextFingerprint(GraftColumnBridge.toExpr(c)))
}
