package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** Native 16-bit PCM statistics from a RIFF/WAVE payload — the first
  * SAMPLE-level audio computation in the multimodal family (the
  * chunk-walk metadata parse is Multimodal.AudioHeaderCodec; this
  * kernel reads the `data` chunk itself): one O(bytes) pass folding
  * little-endian signed int16 samples into
  * (n_samples, sum_sq, peak_abs, n_clip) — the loudness/clipping
  * screen an audio-ingest pipeline runs on every object before
  * anything downstream trusts the waveform.
  *
  * Exactness: sum of squares ≤ 2¹⁵² per sample in a long supports
  * ~10⁸ samples per object (hours of mono 16-bit audio) — exact
  * integers, so the whole fold replays in SQL from the hex rendering
  * of the same bytes. Clipping = samples at either int16 rail
  * (32767 / −32768). The chunk walk honors the declared `data` size
  * (truncated to the available bytes, odd trailing byte dropped) and
  * skips unknown chunks with RIFF pad-byte alignment.
  *
  * Returns NULL for payloads that are not RIFF/WAVE or lack a data
  * chunk — the totality contract of the header codecs.
  */
case class WavPcmStats(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary payload, got ${other.sql}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_samples", LongType, nullable = false),
    StructField("sum_sq", LongType, nullable = false),
    StructField("peak_abs", LongType, nullable = false),
    StructField("n_clip", LongType, nullable = false)))

  override def nullable: Boolean = true

  private def u8(a: Array[Byte], i: Int): Int = a(i) & 0xFF
  private def le32(a: Array[Byte], i: Int): Long =
    (u8(a, i) | (u8(a, i + 1) << 8) | (u8(a, i + 2) << 16) |
      (u8(a, i + 3).toLong << 24)) & 0xFFFFFFFFL

  def compute(bytes: Array[Byte]): InternalRow = {
    if (bytes.length < 12 ||
        !(bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' &&
          bytes(3) == 'F') ||
        !(bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' &&
          bytes(11) == 'E')) return null
    var off = 12
    while (off + 8 <= bytes.length) {
      val isData = bytes(off) == 'd' && bytes(off + 1) == 'a' &&
        bytes(off + 2) == 't' && bytes(off + 3) == 'a'
      val declared = le32(bytes, off + 4)
      val avail = math.min(declared, (bytes.length - off - 8).toLong)
      if (isData) {
        val n = (avail / 2).toInt // trailing odd byte dropped
        var sumSq = 0L
        var peak = 0L
        var clip = 0L
        var i = 0
        val base = off + 8
        while (i < n) {
          val raw = u8(bytes, base + 2 * i) | (u8(bytes, base + 2 * i + 1) << 8)
          val s = if (raw >= 32768) raw - 65536 else raw
          sumSq += s.toLong * s
          val a = math.abs(s.toLong)
          if (a > peak) peak = a
          if (s == 32767 || s == -32768) clip += 1
          i += 1
        }
        return new GenericInternalRow(
          Array[Any](n.toLong, sumSq, peak, clip))
      }
      off += 8 + avail.toInt + (avail.toInt & 1) // RIFF pad alignment
    }
    null
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wavPcm", this, classOf[WavPcmStats].getName)
    nullSafeCodeGen(ctx, ev, c => {
      s"""
       |${ev.value} = $ref.compute($c);
       |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "wav_pcm_stats"
}

object WavPcmStats {
  def of(payload: Column): Column =
    GraftColumnBridge.toColumn(
      WavPcmStats(GraftColumnBridge.toExpr(payload)))
}
