package graft.expressions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text normalization for corpus canonicalization: NFC →
  * lowercase (root locale) → accent fold. One string pass per stage,
  * no UDF — the step that makes "Café" and "café" (combining
  * acute) dedup/fingerprint/shingle identically.
  *
  * Accent folding = NFD, drop combining marks (\p{Mn}), re-NFC: the
  * same result as ICU-style strip_accents for combining-mark
  * diacritics (é ö å ñ ç …). Base letters with no decomposition
  * (ø, ß, ĳ) are deliberately LEFT ALONE — both engines agree, and
  * mangling them would corrupt non-Latin text. Stage order mirrors
  * the SQL rendering strip_accents(lower(nfc_normalize(x))) exactly.
  */
case class TextNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires string")

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    TextNormalize.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"${TextNormalize.getClass.getName.stripSuffix("$")}.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "text_normalize"
}

object TextNormalize {

  /** Called from eval and generated code. */
  def compute(s: UTF8String): UTF8String = {
    val nfc = Normalizer.normalize(s.toString, Normalizer.Form.NFC)
    val lower = nfc.toLowerCase(java.util.Locale.ROOT)
    val nfd = Normalizer.normalize(lower, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    var i = 0
    while (i < nfd.length) {
      val c = nfd.charAt(i)
      if (Character.getType(c) != Character.NON_SPACING_MARK) sb.append(c)
      i += 1
    }
    UTF8String.fromString(
      Normalizer.normalize(sb.toString, Normalizer.Form.NFC))
  }

  def apply(c: Column): Column =
    GraftColumnBridge.toColumn(TextNormalize(GraftColumnBridge.toExpr(c)))
}
