package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Character-distribution Shannon entropy as EXACT fixed-point micros
  * — the compressibility/quality signal (near-zero = repeated-char
  * garbage, ~ln(95) = uniform noise; natural text sits in between).
  *
  * Determinism contract (the house fixed-point trick, same as the
  * unigram LM): each distinct code point's log-probability quantizes
  * ONCE via floor(ln(cnt/n)·1e6) to a LONG, and the result is the
  * exact integer −Σ cnt·that — order-independent, partitioning-
  * invariant, and replayed op-for-op in DuckDB SQL
  * (`FLOOR(ln(cnt / CAST(n AS DOUBLE)) * 1000000.0)` over a char
  * unnest+group). Single pass over the string with a small open-
  * addressing count map; no per-row array materialization.
  */
object TextEntropyImpl {

  /** −Σ_c cnt_c · floor(ln(cnt_c/n)·1e6) over code points; 0 for
    * empty input.
    */
  def entropyMicrosTimesN(s: UTF8String): Long = {
    val str = s.toString
    val counts = new java.util.HashMap[Integer, Long]()
    var n = 0L
    var i = 0
    val len = str.length
    while (i < len) {
      val cp = str.codePointAt(i)
      counts.merge(cp, 1L, (a, b) => a + b)
      n += 1
      i += Character.charCount(cp)
    }
    if (n == 0L) return 0L
    var h = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val cnt = it.next()
      val term = math.floor(math.log(cnt / n.toDouble) * 1000000.0).toLong
      h -= cnt * term
    }
    h
  }
}

/** h_micros_times_n = −Σ cnt·floor(ln(cnt/n)·1e6); divide by n·1e6
  * for nats-per-char (callers do that division once, rounded).
  */
case class TextEntropy(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input")

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    TextEntropyImpl.entropyMicrosTimesN(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.TextEntropyImpl.entropyMicrosTimesN($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "text_entropy_micros"
}

object TextEntropy {
  def apply(c: Column): Column =
    GraftColumnBridge.toColumn(TextEntropy(GraftColumnBridge.toExpr(c)))
}
