package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass corpus-quality features as one struct column.
  *
  * The composable rendering (TextOps.qualityFeatures) emits five
  * independent columns that each re-tokenize the text (column trees
  * can't share subexpressions across select-list items, and
  * CollapseProject re-inlines any staged intermediate). This
  * expression computes all five in one scan of the string. Semantics
  * are identical: tokens split on runs of whitespace, stopwords
  * checked on the lowercased token, punctuation class [.,;:!?'"()-].
  */
case class TextQuality(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires string")

  override def dataType: DataType = TextQuality.schema

  override def nullSafeEval(input: Any): Any =
    TextQuality.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"${TextQuality.getClass.getName.stripSuffix("$")}.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "text_quality"
}

object TextQuality {

  val schema: StructType = StructType(Seq(
    StructField("n_chars", IntegerType, nullable = false),
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("mean_token_len", DoubleType),
    StructField("stopword_ratio", DoubleType),
    StructField("punct_ratio", DoubleType)))

  private val stopwords: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    graft.operators.TextOps.EnglishStopwords.foreach(s.add)
    s
  }

  private def isPunct(c: Char): Boolean = c match {
    case '.' | ',' | ';' | ':' | '!' | '?' | '\'' | '"' | '(' | ')' | '-' => true
    case _ => false
  }

  /** Called from eval and generated code. */
  def compute(s: UTF8String): InternalRow = {
    val str = s.toString
    val nChars = str.length
    var nTokens = 0
    var sumTokLen = 0
    var nStop = 0
    var nPunct = 0
    var i = 0
    while (i < nChars) {
      if (isPunct(str.charAt(i))) nPunct += 1
      i += 1
    }
    i = 0
    while (i < nChars) {
      // skip whitespace run
      while (i < nChars && Tokenize.isWs(str.charAt(i))) i += 1
      if (i < nChars) {
        val start = i
        while (i < nChars && !Tokenize.isWs(str.charAt(i))) i += 1
        nTokens += 1
        sumTokLen += i - start
        if (stopwords.contains(str.substring(start, i).toLowerCase)) nStop += 1
      }
    }
    new GenericInternalRow(Array[Any](
      nChars, nTokens,
      if (nTokens == 0) null else sumTokLen.toDouble / nTokens.toDouble,
      if (nTokens == 0) null else nStop.toDouble / nTokens.toDouble,
      if (nChars == 0) null else nPunct.toDouble / nChars.toDouble))
  }

  def apply(c: Column): Column =
    GraftColumnBridge.toColumn(TextQuality(GraftColumnBridge.toExpr(c)))
}
