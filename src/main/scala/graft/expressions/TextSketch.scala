package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass text-sketch kernels shared by the native expressions
  * below and callable from generated code.
  *
  * All hashes are polynomial code-point folds in exact BIGINT-safe
  * ranges (operands stay < 2^62), so every sketch here is replayable
  * in the DuckDB oracle with plain integer SQL — unlike xxhash64,
  * which no other engine reproduces.
  *
  * Tokenization matches `split(text, "\\s+")` with empties dropped:
  * the Java-regex `\s` class is exactly {space, \t, \n, \x0B, \f, \r}.
  */
object TextSketchKernels {
  val P1 = 1000000007L // base-31 fold modulus (same as TextHash.Mod)
  val P2 = 998244353L // base-131 fold modulus (second hash for 60 bits)
  val SimHashBits = 60

  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Token boundaries as (start, end) index pairs — no substring
    * allocation.
    */
  private def tokenSpans(s: String): Array[Int] = {
    val spans = new scala.collection.mutable.ArrayBuffer[Int](32)
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && isWs(s.charAt(i))) i += 1
      if (i < n) {
        val start = i
        while (i < n && !isWs(s.charAt(i))) i += 1
        spans += start += i
      }
    }
    spans.toArray
  }

  /** 60-bit per-token hash: base-31 fold mod P1 in bits 0..29 plus
    * base-131 fold mod P2 shifted into bits 30..59 (both folds in one
    * scan). DuckDB rendering: two list_reduce folds + `* 1073741824`.
    */
  private def combined60(s: String, from: Int, until: Int): Long = {
    var h1 = 0L
    var h2 = 0L
    var i = from
    while (i < until) {
      val cp = s.codePointAt(i)
      h1 = (h1 * 31L + cp) % P1
      h2 = (h2 * 131L + cp) % P2
      i += Character.charCount(cp)
    }
    h1 + (h2 << 30)
  }

  /** SimHash over whitespace tokens: one pass, one long out. Bit b is
    * set when strictly more token hashes have bit b set than clear
    * (the `> 0` rule of Dedup.simhash64).
    */
  def simhash(text: UTF8String): Long = {
    val s = text.toString
    val spans = tokenSpans(s)
    val counters = new Array[Int](SimHashBits)
    var t = 0
    while (t < spans.length) {
      val h = combined60(s, spans(t), spans(t + 1))
      var b = 0
      while (b < SimHashBits) {
        if (((h >> b) & 1L) == 1L) counters(b) += 1 else counters(b) -= 1
        b += 1
      }
      t += 2
    }
    var r = 0L
    var b = 0
    while (b < SimHashBits) {
      if (counters(b) > 0) r |= 1L << b
      b += 1
    }
    r
  }

  /** Ordered word-n-gram shingle hashes: base-31 fold mod P1 across
    * the concatenated tokens of each n-gram (no separator — same
    * value as hashing `concat_ws("", slice(toks, i, n))`). Fewer than
    * n tokens (including zero) hash the whole-token concatenation,
    * matching TextOps.shingles' fallback shingle.
    */
  def shingleHashes(text: UTF8String, n: Int): GenericArrayData = {
    val s = text.toString
    val spans = tokenSpans(s)
    val nTok = spans.length / 2

    def hashRange(tokFrom: Int, tokUntil: Int): Long = {
      var h = 0L
      var t = tokFrom
      while (t < tokUntil) {
        var i = spans(2 * t)
        val until = spans(2 * t + 1)
        while (i < until) {
          val cp = s.codePointAt(i)
          h = (h * 31L + cp) % P1
          i += Character.charCount(cp)
        }
        t += 1
      }
      h
    }

    if (nTok < n) new GenericArrayData(Array(hashRange(0, nTok)))
    else {
      val out = new Array[Long](nTok - n + 1)
      var i = 0
      while (i <= nTok - n) {
        out(i) = hashRange(i, i + n)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  /** Ordered 60-bit span hashes, STRICT: one combined60 (both folds)
    * per `n`-token window over the concatenated tokens, array index =
    * window start position; fewer than `n` tokens yield an EMPTY
    * array (no whole-doc fallback — a 3-token doc must not register a
    * spurious corpus-wide span). The 60-bit width is what keeps span
    * counting sound at 100 TB: a single 30-bit fold saturates with
    * collisions past ~10^5 distinct spans.
    */
  def spanHashes60(text: UTF8String, n: Int): GenericArrayData = {
    val s = text.toString
    val spans = tokenSpans(s)
    val nTok = spans.length / 2
    if (nTok < n) new GenericArrayData(Array.emptyLongArray)
    else {
      val out = new Array[Long](nTok - n + 1)
      var w = 0
      while (w <= nTok - n) {
        var h1 = 0L
        var h2 = 0L
        var t = w
        while (t < w + n) {
          var i = spans(2 * t)
          val until = spans(2 * t + 1)
          while (i < until) {
            val cp = s.codePointAt(i)
            h1 = (h1 * 31L + cp) % P1
            h2 = (h2 * 131L + cp) % P2
            i += Character.charCount(cp)
          }
          t += 1
        }
        out(w) = h1 + (h2 << 30)
        w += 1
      }
      new GenericArrayData(out)
    }
  }
}

/** Native one-pass SimHash (see TextOps.simhashHof for the composable
  * reference rendering). Map-only: unlike Dedup.simhash64's
  * explode + 64 bit-sums + groupBy, no shuffle at any scale.
  */
case class TextSimHash(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string input")

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    TextSketchKernels.simhash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TextSketchKernels.simhash($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "text_simhash"
}

object TextSimHash {
  def apply(c: Column): Column =
    GraftColumnBridge.toColumn(TextSimHash(GraftColumnBridge.toExpr(c)))
}

/** Native ordered shingle-hash array: the base layer for MinHash and
  * winnowing — produces the hashes directly from the text in one pass,
  * never materializing shingle strings (the HOF path allocates one
  * concatenated string per shingle).
  */
case class TextShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string input")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    TextSketchKernels.shingleHashes(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.TextSketchKernels.shingleHashes($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "text_shingle_hashes"
}

object TextShingleHashes {
  def apply(c: Column, n: Int): Column =
    GraftColumnBridge.toColumn(TextShingleHashes(GraftColumnBridge.toExpr(c), n))
}

/** Native ordered 60-bit span-hash array (strict — empty below `n`
  * tokens): the scan layer for Dedup.repeatedSpans. One pass, no
  * span strings materialized; the HOF reference rendering is
  * `transform(<strict span strings>, TextOps.combined60Hof)`
  * (equality asserted in TextMultimodalSpec).
  */
case class TextSpanHashes60(child: Expression, n: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string input")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    TextSketchKernels.spanHashes60(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.TextSketchKernels.spanHashes60($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "text_span_hashes60"
}

object TextSpanHashes60 {
  def apply(c: Column, n: Int): Column =
    GraftColumnBridge.toColumn(TextSpanHashes60(GraftColumnBridge.toExpr(c), n))
}
