package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.expressions.{JaroWinkler, JaroWinklerImpl}
import graft.operators.RecordLinkage

/** Jaro–Winkler parity with DuckDB's `jaro_winkler_similarity`
  * (probed vectors, exact doubles), algebraic properties, codegen ==
  * interpreted, and blocked-linkage recall on planted typo pairs.
  */
class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    JaroWinklerImpl.jw(UTF8String.fromString(a), UTF8String.fromString(b))
  private def jaro(a: String, b: String): Double =
    JaroWinklerImpl.jaro(UTF8String.fromString(a), UTF8String.fromString(b))

  test("DuckDB-probed vectors match exactly") {
    // probed 2026-08-14 against duckdb jaro_winkler_similarity/jaro_similarity
    assert(jw("martha", "marhta") == 0.9611111111111111)
    assert(jw("DWAYNE", "DUANE") == 0.8400000000000001)
    assert(jw("DIXON", "DICKSONX") == 0.8133333333333332)
    assert(jw("abc", "abc") == 1.0)
    assert(jw("abc", "xyz") == 0.0)
    // boost NOT applied at/below jaro 0.7 (DuckDB threshold)
    assert(jw("abcdefgh", "abzzzzzz") == 0.5)
    // no shared prefix -> no boost even above threshold
    assert(jw("CRATE", "TRACE") == 0.7333333333333334)
    assert(jaro("martha", "marhta") == 0.9444444444444445)
    assert(jaro("DIXON", "DICKSONX") == 0.7666666666666666)
    assert(jaro("aaaaaaaaaa", "aabbbbbbbb") == 0.4666666666666666)
    // DuckDB: either side empty -> 0.0 (not the textbook 1.0)
    assert(jw("", "") == 0.0)
    assert(jw("a", "") == 0.0)
    assert(jw("a", "a") == 1.0)
  }

  test("symmetry and bounds over the part-name vocab") {
    val names = Tables.part(spark, Sf0001)
      .select("p_name").distinct().as[String].collect()
    for (a <- names; b <- names) {
      val s = jw(a, b)
      assert(s == jw(b, a))
      assert(s >= 0.0 && s <= 1.0)
      if (a == b) assert(s == 1.0)
    }
  }

  test("codegen path == direct impl on a DataFrame") {
    val df = Seq(
      ("martha", "marhta"), ("DIXON", "DICKSONX"), ("cold rod", "blue rod"),
      ("", ""), ("widget", "widget")).toDF("a", "b")
    val got = df.select(JaroWinkler(col("a"), col("b"))).as[Double].collect()
    val want = df.select("a", "b").as[(String, String)].collect()
      .map { case (a, b) => jw(a, b) }
    assert(got.toSeq == want.toSeq)
  }

  test("null inputs null out") {
    val df = Seq((Some("a"), None: Option[String])).toDF("a", "b")
    assert(df.select(JaroWinkler(col("a"), col("b"))).first().isNullAt(0))
  }

  test("blocked linkage finds planted typo pairs without all-pairs") {
    val df = Seq(
      "acme corporation", "acme corpration",  // deletion, shares first char
      "zeta widget", "beta widget",           // shares last token only
      "unrelated thing").toDF("p_name")
    val pairs = RecordLinkage.fuzzyNamePairs(df, "p_name", 0.82)
      .select("name1", "name2").as[(String, String)].collect().toSet
    assert(pairs.contains(("acme corporation", "acme corpration")))
    // suffix-block pass catches what the prefix block misses
    assert(pairs.contains(("beta widget", "zeta widget")))
    assert(!pairs.exists(p => p._1 == "unrelated thing" || p._2 == "unrelated thing"))
  }
}
