package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Aho–Corasick multi-pattern counter (Aho & Corasick CACM'75):
  * per input string, the number of occurrences of EACH of m literal
  * patterns — all matches, overlapping included — in ONE automaton
  * pass over the bytes, O(n + matches) per row regardless of m.
  *
  * Why a kernel: the composable rendering is m separate
  * contains/regexp scans — m full passes over every document, and the
  * blocklists this exists for (badword/boilerplate/license screens à
  * la C4) run hundreds of patterns over every crawled byte. The
  * automaton makes pattern count a free variable: the 100 TB screen
  * scan costs the same at m = 8 and m = 800.
  *
  * Byte-level automaton over UTF-8: exact for any byte-literal
  * pattern (ASCII blocklists trivially; multi-byte UTF-8 literals
  * match byte-exactly too since UTF-8 is self-synchronizing for
  * complete sequences). Output: array<long> of per-pattern counts in
  * pattern order — callers fold hits/distinct off the (tiny) array.
  * Replay: counting every occurrence incl. overlaps is positionally
  * definable, so the oracle states it as a per-position substring
  * probe — no automaton state to drift.
  */
case class AhoCorasickCounts(child: Expression, patterns: Seq[String])
    extends UnaryExpression {

  require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
    "AhoCorasickCounts requires non-empty literal patterns")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  /** goto/fail/output automaton, built once per executor.
    * States are dense ints; transitions as Array[Array[Int]](state)(byte)
    * is m·len·256 ints — fine for blocklist-sized pattern sets (the
    * documented regime; a 10⁵-pattern dictionary would want a sparse
    * goto map instead).
    */
  @transient private lazy val automaton: AhoCorasickCounts.Automaton =
    AhoCorasickCounts.build(patterns)

  def compute(input: UTF8String): GenericArrayData = {
    val a = automaton
    val bytes = input.getBytes
    val counts = new Array[Long](patterns.length)
    var s = 0
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xFF
      var t = a.goto(s)(b)
      while (t == -1) { s = a.fail(s); t = a.goto(s)(b) }
      s = t
      // output chain: every pattern ending at this state (suffix links)
      var o = s
      while (o != 0) {
        val hit = a.out(o)
        if (hit >= 0) counts(hit) += 1
        o = a.outLink(o)
      }
      i += 1
    }
    new GenericArrayData(counts)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("acCounts", this,
      classOf[AhoCorasickCounts].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "aho_corasick_counts"
}

object AhoCorasickCounts {

  /** goto: −1 = undefined except at the root (root self-loops on
    * misses so the fail-walk always terminates); out: pattern index
    * ending exactly at this state, or −1; outLink: next state in the
    * suffix chain that ends some pattern (collapsed dict-suffix link).
    */
  final case class Automaton(
      goto: Array[Array[Int]],
      fail: Array[Int],
      out: Array[Int],
      outLink: Array[Int])

  def build(patterns: Seq[String]): Automaton = {
    val maxStates = 1 + patterns.map(_.getBytes("UTF-8").length).sum
    val goto = Array.fill(maxStates)(Array.fill(256)(-1))
    val out = Array.fill(maxStates)(-1)
    var nStates = 1
    patterns.zipWithIndex.foreach { case (p, pi) =>
      var s = 0
      p.getBytes("UTF-8").foreach { bb =>
        val b = bb & 0xFF
        if (goto(s)(b) == -1) { goto(s)(b) = nStates; nStates += 1 }
        s = goto(s)(b)
      }
      out(s) = pi // duplicate patterns: last wins (callers dedupe)
    }
    val fail = Array.fill(nStates)(0)
    val outLink = Array.fill(nStates)(0)
    val queue = new java.util.ArrayDeque[Int]()
    var b = 0
    while (b < 256) {
      val t = goto(0)(b)
      if (t == -1) goto(0)(b) = 0 // root self-loop on miss
      else if (t != 0) queue.add(t)
      b += 1
    }
    while (!queue.isEmpty) {
      val s = queue.poll()
      // collapsed dictionary-suffix link: nearest fail ancestor that
      // ends a pattern (so match emission skips non-output states)
      outLink(s) =
        if (out(fail(s)) >= 0) fail(s) else outLink(fail(s))
      b = 0
      while (b < 256) {
        val t = goto(s)(b)
        if (t != -1 && t != 0) {
          var f = fail(s)
          while (goto(f)(b) == -1) f = fail(f)
          fail(t) = goto(f)(b)
          queue.add(t)
        }
        b += 1
      }
    }
    Automaton(goto, fail, out, outLink)
  }

  def of(text: Column, patterns: Seq[String]): Column =
    GraftColumnBridge.toColumn(
      AhoCorasickCounts(GraftColumnBridge.toExpr(text), patterns))
}
