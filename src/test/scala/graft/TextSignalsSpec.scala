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

  test("RAKE: hand-computed phrase scores (degree/frequency) and " +
      "rank order on the paper-style fixture") {
    import graft.operators.Rake
    val df = Seq((1L,
      "deep learning systems of the modern era and deep learning"))
      .toDF("id", "txt")
    val out = Rake.keywords(df, "id", col("txt"),
        Seq("of", "the", "and"), k = 3)
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getLong(2), r.getInt(3)))
    // freq: deep 2, learning 2, systems 1, modern 1, era 1
    // deg:  deep 5, learning 5, systems 3, modern 2, era 2
    // wscore micros: deep/learning 2.5e6, systems 3e6, modern/era 2e6
    assert(out(0) == (("deep learning systems", 8000000L, 1)))
    assert(out(1) == (("deep learning", 5000000L, 2)))
    assert(out(2) == (("modern era", 4000000L, 3)))
  }

  test("luhnValid: canonical ISO 7812 vectors; neighbor check digits " +
      "all fail; single digit is vacuous") {
    import graft.operators.TextOps
    val cases = Seq(
      "79927398713" -> true,  // THE textbook Luhn example
      "4111111111111111" -> true, // classic 16-digit test PAN
      "4539578763621486" -> true,
      "49927398716" -> true,
      "49927398717" -> false,
      "1234567812345678" -> false,
      "0" -> false) ++ // vacuous: single digit rejected by length
      (0 to 9).filter(_ != 3).map(d => s"7992739871$d" -> false)
    val df = cases.toDF("dg", "want")
    val got = df.select(col("dg"), col("want"),
        TextOps.luhnValid(col("dg")).as("ok"))
      .collect()
    got.foreach(r => assert(r.getBoolean(1) == r.getBoolean(2),
      s"${r.getString(0)}: want ${r.getBoolean(1)}"))
  }

  test("redactCards scrubs card-shaped runs (grouped or plain) and " +
      "leaves short digit runs alone") {
    import graft.operators.TextOps
    val out = Seq(
      "pay 4111-1111-1111-1111 now",
      "pan 4111111111111111 ok",
      "order 12345678 is short",
      "ref 1234 5678 9012 3456 thanks")
      .toDF("t").select(TextOps.redactCards(col("t")).as("r"))
      .as[String].collect()
    assert(out(0) == "pay <CARD> now")
    assert(out(1) == "pan <CARD> ok")
    assert(out(2) == "order 12345678 is short")
    assert(out(3) == "ref <CARD> thanks")
  }

  test("AhoCorasickCounts: the classic he/she/his/hers automaton — " +
      "suffix-pattern emission, overlaps, and brute-force agreement") {
    import graft.expressions.AhoCorasickCounts
    val pats = Seq("he", "she", "his", "hers")
    def counts(s: String): Seq[Long] =
      Seq(s).toDF("t")
        .select(AhoCorasickCounts.of(col("t"), pats).as("c"))
        .collect().head.getSeq[Long](0)
    // "ushers": 'she' ends at 4, its suffix 'he' must ALSO emit (the
    // dict-suffix link), 'hers' ends at 6 — the CACM'75 fixture
    assert(counts("ushers") === Seq(1L, 1L, 0L, 1L))
    // overlapping self-matches: "hehehe" has 'he' at 0,2,4
    assert(counts("hehehe") === Seq(3L, 0L, 0L, 0L))
    assert(counts("") === Seq(0L, 0L, 0L, 0L))
    // brute force agreement on noisy text (every start offset probed)
    val noisy = "shershehishehersheshers ushe rs his shehe"
    def brute(s: String, p: String): Long =
      s.indices.count(i => s.startsWith(p, i)).toLong
    assert(counts(noisy) === pats.map(brute(noisy, _)))
  }

  test("blocklistScreen: hit totals, distinct-pattern counts, and the " +
      "block decision — overlap counting pinned") {
    import graft.operators.TextOps
    val docs = Seq(
      (0L, "clean text nothing here"),
      (1L, "batch batch batch stream"), // "batch batch" x2 (overlap)
      (2L, "slow merge then spark window opens"), // 2 distinct pats
      (3L, "batch batch only once here slow"))
      .toDF("doc_id", "text")
    val m = TextOps.blocklistScreen(docs, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getInt(2), r.getBoolean(3)))).toMap
    assert(m(0L) === ((0L, 0, false)))
    assert(m(1L) === ((2L, 1, false)), "overlap counting: 2 hits, 1 pattern")
    assert(m(2L) === ((2L, 2, true)), "2 distinct patterns blocks")
    assert(m(3L) === ((1L, 1, false)))
  }
}
