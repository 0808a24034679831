package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native language-ID: one pass over the text, lowercasing and
  * counting marker-word hits per profile, argmax with profile-order
  * tie-break — semantics identical to TextOps.langId (the composable
  * map-lookup fold), asserted equal in TextMultimodalSpec.
  */
object LangIdHelper {
  import graft.operators.TextOps.LangProfiles

  val langs: Array[String] = LangProfiles.map(_._1).toArray :+ "und"

  private val markerToIdx: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    LangProfiles.zipWithIndex.foreach { case ((_, ws), i) =>
      // first profile wins for shared markers — matches map() literal
      // semantics where duplicate keys keep the first entry
      ws.foreach(w => if (!m.containsKey(w)) m.put(w, i))
    }
    m
  }

  def idOf(s: UTF8String): UTF8String = {
    val str = s.toString.toLowerCase
    val counts = new Array[Int](LangProfiles.size)
    val n = str.length
    var i = 0
    while (i < n) {
      while (i < n && Tokenize.isWs(str.charAt(i))) i += 1
      if (i < n) {
        val start = i
        while (i < n && !Tokenize.isWs(str.charAt(i))) i += 1
        val idx = markerToIdx.get(str.substring(start, i))
        if (idx != null) counts(idx) += 1
      }
    }
    var best = 0
    var bestIdx = -1
    var j = 0
    while (j < counts.length) {
      if (counts(j) > best) { best = counts(j); bestIdx = j }
      j += 1
    }
    UTF8String.fromString(if (bestIdx < 0) "und" else langs(bestIdx))
  }
}

case class LangId(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires string")

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    LangIdHelper.idOf(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.LangIdHelper.idOf($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "lang_id"
}

object LangId {
  def apply(c: Column): Column =
    GraftColumnBridge.toColumn(LangId(GraftColumnBridge.toExpr(c)))
}
