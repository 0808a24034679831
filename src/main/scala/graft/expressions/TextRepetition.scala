package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass word-n-gram repetition signals (Gopher-style quality
  * filters, Rae et al. 2021 §A1.1): the standard pre-training heuristic
  * that machine-generated / boilerplate text repeats itself.
  *
  *   - `top_2gram_frac`: occurrences of the most frequent word 2-gram
  *     over total 2-gram positions — high ⇒ one phrase dominates;
  *   - `dup_3gram_frac`: fraction of 3-gram positions whose 3-gram
  *     occurs more than once — high ⇒ the document loops.
  *
  * Tokenization matches [[TextQuality]]: tokens are maximal runs of
  * non-whitespace. Fractions are exact-integer divisions (no float
  * accumulation), so the value is bit-identical on any engine.
  *
  * A composable rendering (explode n-grams → count per (doc, gram) →
  * re-aggregate) shuffles every n-gram of the corpus twice; this
  * expression computes both signals in one scan of the string with a
  * per-row hash map bounded by the document's own n-gram count —
  * map-only at any corpus scale.
  */
case class TextRepetition(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires string")

  override def dataType: DataType = TextRepetition.schema

  override def nullSafeEval(input: Any): Any =
    TextRepetition.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"${TextRepetition.getClass.getName.stripSuffix("$")}.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "text_repetition"
}

object TextRepetition {

  val schema: StructType = StructType(Seq(
    StructField("n_2grams", IntegerType, nullable = false),
    StructField("top_2gram_frac", DoubleType),
    StructField("n_3grams", IntegerType, nullable = false),
    StructField("dup_3gram_frac", DoubleType)))

  /** Called from eval and generated code. */
  def compute(s: UTF8String): InternalRow = {
    val str = s.toString
    val n = str.length
    // token spans (start, end), one pass
    val starts = new java.util.ArrayList[Integer]()
    val ends = new java.util.ArrayList[Integer]()
    var i = 0
    while (i < n) {
      while (i < n && Tokenize.isWs(str.charAt(i))) i += 1
      if (i < n) {
        starts.add(i)
        while (i < n && !Tokenize.isWs(str.charAt(i))) i += 1
        ends.add(i)
      }
    }
    val t = starts.size()

    // n-grams join tokens with a single space (NOT the original
    // separator run), so irregular whitespace can't make two equal
    // token sequences hash apart — and the SQL rendering's
    // `tok || ' ' || tok` builds the identical string.
    def gram(k: Int, from: Int): String = {
      val sb = new java.lang.StringBuilder(
        ends.get(from + k - 1) - starts.get(from))
      var x = 0
      while (x < k) {
        if (x > 0) sb.append(' ')
        sb.append(str, starts.get(from + x), ends.get(from + x))
        x += 1
      }
      sb.toString
    }

    // 2-grams: top-frequency fraction
    val n2 = math.max(t - 1, 0)
    var top2: Any = null
    if (n2 > 0) {
      val counts = new java.util.HashMap[String, Int](n2 * 2)
      var mx = 0
      var j = 0
      while (j < n2) {
        val g = gram(2, j)
        val c = counts.merge(g, 1, (a, b) => a + b)
        if (c > mx) mx = c
        j += 1
      }
      top2 = mx.toDouble / n2.toDouble
    }

    // 3-grams: duplicated-position fraction
    val n3 = math.max(t - 2, 0)
    var dup3: Any = null
    if (n3 > 0) {
      val counts = new java.util.HashMap[String, Int](n3 * 2)
      var j = 0
      while (j < n3) {
        counts.merge(gram(3, j), 1, (a, b) => a + b)
        j += 1
      }
      var dupPos = 0
      val it = counts.values().iterator()
      while (it.hasNext) {
        val c = it.next()
        if (c > 1) dupPos += c
      }
      dup3 = dupPos.toDouble / n3.toDouble
    }

    new GenericInternalRow(Array[Any](n2, top2, n3, dup3))
  }

  def apply(c: Column): Column =
    GraftColumnBridge.toColumn(TextRepetition(GraftColumnBridge.toExpr(c)))
}
