package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.expressions.{DeflateRatio, DeflateRatioImpl, TextEntropy, TextEntropyImpl}

/** TextEntropy exact-value + parity tests and DeflateRatio property
  * tests (spec-gated: no cross-engine oracle exists for deflate).
  */
class TextSignalsSpec extends SparkSpec {
  import spark.implicits._

  private def hm(s: String): Long =
    TextEntropyImpl.entropyMicrosTimesN(UTF8String.fromString(s))
  private def ratio(s: String): Long =
    DeflateRatioImpl.ratioMilli(UTF8String.fromString(s))

  test("entropy exact values") {
    assert(hm("") == 0L)
    assert(hm("aaaa") == 0L) // ln(1) = 0
    // "ab": each char p=1/2 -> floor(ln(0.5)*1e6) = -693148 (ln.5=-0.6931471...)
    //  hm = -(1*-693148 + 1*-693148) = 1386296
    assert(hm("ab") == 1386296L)
    // "aab": p_a=2/3, p_b=1/3 -> floor(ln(2/3)*1e6) = -405466 (ln(2/3)=-0.405465)
    //  floor(ln(1/3)*1e6) = -1098613 (ln(1/3)=-1.0986122)
    //  hm = -(2*-405466 + 1*-1098613) = 1909545
    assert(hm("aab") == 1909545L)
  }

  test("entropy is a reduce over char counts — replay matches SQL shape") {
    val docs = Tables.documents(spark, Sf0001).limit(30)
      .select("doc_id", "text").as[(Long, String)].collect()
    for ((_, text) <- docs) {
      val counts = text.toSeq.groupBy(identity).map(_._2.size.toLong)
      val n = text.length.toLong
      val want = -counts.map(c =>
        c * math.floor(math.log(c / n.toDouble) * 1e6).toLong).sum
      assert(hm(text) == want)
    }
  }

  test("entropy codegen path on real docs matches direct impl") {
    val got = Tables.documents(spark, Sf0001).limit(20)
      .select(col("text"), TextEntropy(col("text")).as("hm"))
      .as[(String, Long)].collect()
    for ((text, v) <- got) assert(v == hm(text))
  }

  test("deflate ratio: repetitive < prose < random; bounds sane") {
    val rep = "spam spam spam " * 200
    val prose = ("the quick brown fox jumps over the lazy dog and then " +
      "discusses compression ratios at length with a passing badger ") * 20
    val rng = new scala.util.Random(42)
    val rand = Array.fill(3000)((33 + rng.nextInt(90)).toChar).mkString
    assert(ratio(rep) < ratio(prose))
    assert(ratio(prose) < ratio(rand))
    assert(ratio(rep) > 0 && ratio(rand) < 1200)
    assert(ratio("") == 1000L)
  }

  test("deflate ratio deterministic across evals and codegen path") {
    val docs = Tables.documents(spark, Sf0001).limit(20)
    val a = docs.select(DeflateRatio(col("text"))).as[Long].collect()
    val b = docs.select(DeflateRatio(col("text"))).as[Long].collect()
    assert(a.toSeq == b.toSeq)
    val direct = docs.select("text").as[String].collect().map(ratio)
    assert(a.toSeq == direct.toSeq)
  }
}
