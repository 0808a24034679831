package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Jaro and Jaro–Winkler string similarity (Winkler '90, the record-
  * linkage classic), engine-parity with DuckDB's
  * `jaro_winkler_similarity` so fuzzy-linkage queries can ride the
  * exact oracle gate:
  *
  *  - Jaro: match window `max(|a|,|b|)/2 - 1` (floor, min 0), matches
  *    counted greedily left-to-right, transpositions = half the number
  *    of positionally-misordered matched characters.
  *  - Winkler boost applied ONLY when jaro > 0.7 (DuckDB's
  *    boost_threshold — probed: 'abcdefgh'/'abzzzzzz' jaro 0.5 keeps
  *    JW 0.5): jw = jaro + 0.1 · min(4, commonPrefix) · (1 − jaro).
  *  - Either side empty → 0.0 (DuckDB probed: ('','') → 0.0, NOT the
  *    textbook 1.0).
  *
  * Comparison is over UTF-16 code units (Java chars); the synthetic
  * vocab is ASCII so this is also code-point semantics there.
  *
  * Scale shape: a scalar codegen'd expression — O(|a|·|b|) worst case
  * per pair with two small int scratch arrays. The linkage operator
  * (Queries `q_l_fuzzy_linkage`) only ever evaluates it on BLOCKED
  * candidate pairs of the vocab-sized distinct-name table, never on
  * the fact table.
  */
object JaroWinklerImpl {
  /** Plain Jaro similarity in [0,1]. */
  def jaro(sa: UTF8String, sb: UTF8String): Double = {
    val a = sa.toString
    val b = sb.toString
    val m = a.length
    val n = b.length
    if (m == 0 || n == 0) return 0.0
    if (a == b) return 1.0
    val window = math.max(0, math.max(m, n) / 2 - 1)
    val aMatch = new Array[Boolean](m)
    val bMatch = new Array[Boolean](n)
    var matches = 0
    var i = 0
    while (i < m) {
      val lo = math.max(0, i - window)
      val hi = math.min(n - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bMatch(j) && a.charAt(i) == b.charAt(j)) {
          aMatch(i) = true
          bMatch(j) = true
          matches += 1
          found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // transpositions: walk matched chars of a against matched chars of b
    var transpo = 0
    var k = 0
    i = 0
    while (i < m) {
      if (aMatch(i)) {
        while (!bMatch(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) transpo += 1
        k += 1
      }
      i += 1
    }
    // DuckDB FLOORS the half-transposition count (integer division in
    // its C impl — probed: 'large gizmo'/'red gizmo' has 8 matches
    // with 3 positional mismatches and DuckDB scores (8-1)/8, not
    // (8-1.5)/8). Greedy matching can pick different char multisets
    // from the two sides, so the mismatch count CAN be odd.
    val mm = matches.toDouble
    (mm / m + mm / n + (mm - transpo / 2) / mm) / 3.0
  }

  /** Jaro–Winkler with DuckDB's parameters (p=0.1, maxPrefix=4,
    * boost only above 0.7).
    */
  def jw(sa: UTF8String, sb: UTF8String): Double = {
    val j = jaro(sa, sb)
    if (j <= 0.7) return j
    val a = sa.toString
    val b = sb.toString
    val lim = math.min(4, math.min(a.length, b.length))
    var p = 0
    while (p < lim && a.charAt(p) == b.charAt(p)) p += 1
    j + 0.1 * p * (1.0 - j)
  }
}

case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string inputs, got " +
        s"${left.dataType.sql} / ${right.dataType.sql}")

  override def dataType: DataType = DoubleType

  override def nullSafeEval(l: Any, r: Any): Any =
    JaroWinklerImpl.jw(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.expressions.JaroWinklerImpl.jw($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "jaro_winkler"
}

object JaroWinkler {
  def apply(a: Column, b: Column): Column =
    GraftColumnBridge.toColumn(
      JaroWinkler(GraftColumnBridge.toExpr(a), GraftColumnBridge.toExpr(b)))
}
