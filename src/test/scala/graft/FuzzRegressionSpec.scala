package graft

import graft.operators.{PositionalSplit, Stats}
import graft.tools.Fuzz
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
/** Permanent pins for divergences found by the r13 differential fuzz
  * harness (tools/Fuzz + tools/fuzz_check.py). Each test replays the
  * exact regime that diverged, so the bug class cannot silently
  * return even if the fuzz harness or its seeds change.
  */
class FuzzRegressionSpec extends SparkSpec {

  import spark.implicits._

  // ---- positional_split s6/s12: n = 0 dropped first-group rows ----
  // from BOTH splits (NULL boundary key -> three-valued k2 <= K).

  test("splitAt n=0: empty train, complete test (fuzz s12 fixture)") {
    val df = Seq((2L, 0L)).toDF("k1", "k2")
    val (tr, te) = PositionalSplit.splitAt(df, "k1", "k2", 0L)
    assert(tr.count() === 0L)
    assert(te.count() === 1L)
  }

  test("splitAt n=0 multi-group (fuzz s6 fixture) and rank twin") {
    val df = Seq((1L, 0L), (3L, 1L), (4L, 2L)).toDF("k1", "k2")
    val (tr, te) = PositionalSplit.splitAt(df, "k1", "k2", 0L)
    assert(tr.count() === 0L)
    assert(te.orderBy("k1").as[(Long, Long)].collect().toSeq ===
      Seq((1L, 0L), (3L, 1L), (4L, 2L)))
    assert(PositionalSplit.firstNWithRank(df, "k1", "k2", 0L).count() === 0L)
  }

  test("splitAt complementarity at every n (the invariant n=0 broke)") {
    val df = Seq((1L, 0L), (1L, 1L), (3L, 2L), (4L, 3L), (4L, 4L))
      .toDF("k1", "k2")
    for (n <- 0L to 7L) {
      val (tr, te) = PositionalSplit.splitAt(df, "k1", "k2", n)
      assert(tr.count() === math.min(n, 5L), s"train at n=$n")
      assert(tr.count() + te.count() === 5L, s"total at n=$n")
      assert(tr.intersect(te).count() === 0L, s"overlap at n=$n")
    }
  }

  // ---- stats_fdiv s0/s2: DuckDB `//` TRUNCATES toward zero (the ----
  // r11 note claimed it floors). fdivExact must floor for signed
  // numerators with den > 0; bare `div` is the truncating twin.

  test("fdivExact floors signed numerators; div truncates (fuzz s0)") {
    val df = Seq((-7L, 3L), (7L, 3L), (-9L, 3L), (-1L, 1000L))
      .toDF("a", "b")
    val got = df.select(
        Stats.fdivExact(col("a"), col("b")).as("fd"),
        expr("a div b").as("td"),
        pmod(col("a"), col("b")).as("pm"))
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((-3L, -2L, 2L), (2L, 2L, 1L), (-3L, -3L, 0L),
      (-1L, 0L, 999L)))
  }

  // ---- conformal: the fit mean's floor division on a NEGATIVE ----
  // non-divisible calibration-split sum (the oracle's bare // read
  // one higher before the r13 pre-adjustment fix).

  test("splitConformal yhat floors negative non-divisible sums") {
    // fit split (id % 3 == 0): ids 0, 3 with v = -3, -4 -> sum -7 over
    // 2 rows -> yhat = floor(-7/2) = -4; TRUNCATION would give -3.
    // cal split: 9 rows of v = 6 -> residual |6 - yhat| = 10 under
    // floor, 9 under trunc; k = ((9+1)*900000 + 999999) // 1e6 = 9 ->
    // qhat = 9th smallest residual. qhat == 10 pins the floor.
    val fit = Seq((0L, -3L), (3L, -4L))
    val cal = Seq(1L, 4L, 7L, 10L, 13L, 16L, 19L, 22L, 25L).map((_, 6L))
    val ev = Seq((2L, -14L), (5L, 6L))
    val df = (fit ++ cal ++ ev).map { case (id, v) => (id, "g", 0L, v) }
      .toDF("id", "grp", "hr", "v")
    val out = graft.operators.Conformal
      .splitConformal(df, "id", "grp", "hr", "v", 100000L)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(out.length === 1)
    val (_, nCal, qhat, nEval, nCov, _) = out.head
    assert(nCal === 9L)
    assert(qhat === 10L) // floor(-7/2) = -4 convention; trunc reads 9
    // eval vs yhat=-4, qhat=10: |-14+4| = 10 covered, |6+4| = 10
    // covered (under trunc/9: 11 > 9 misses, 9 <= 9 covers -> 1)
    assert(nEval === 2L && nCov === 2L)
  }

  // ---- token_count: size(NULL) reads -1 under legacy sizeOfNull; ----
  // the catalog expression must be null-safe (NULL in, NULL out).

  test("q_t_token_count shape is null-safe on null text") {
    val df = Seq((1L, "a b"), (2L, null), (3L, ""))
      .toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
        when(col("text").isNull, lit(null).cast("int"))
          .otherwise(size(filter(split(col("text"), "\\s+"),
            t => length(t) > 0))).as("n_tokens"))
      .orderBy("doc_id")
      .collect().map(r => if (r.isNullAt(1)) -999 else r.getInt(1)).toSeq
    assert(got === Seq(2, -999, 0))
  }

  // ---- parseDateMulti domain: 4-digit years only (strptime %Y ----
  // accepts '1-1-1' as 0001-01-01; Spark's strict yyyy rejects it).

  test("parseDateMulti rejects sub-4-digit years (fuzz multidate s0)") {
    val df = Seq("1-1-1", "0-0-0000", "12-08-2279", "2020-13-45")
      .toDF("dstr")
    val got = df.select(date_format(
        graft.functions.ScalarOps.parseDateMulti(col("dstr")),
        "yyyy-MM-dd").as("p"))
      .collect().map(r => Option(r.getString(0))).toSeq
    assert(got === Seq(None, None, Some("2279-08-12"), None))
  }

  // ---- stats_qnorm s0/s6: ROUND(x, 6) is not cross-engine at ----
  // |x| >~ 2^43 (DuckDB rounds via x*1e6 in double; Spark via exact
  // BigDecimal). quantileNormalize now emits the UNROUNDED norm_x,
  // whose ops are all exactly-representable or correctly-rounded
  // identically in any IEEE engine.

  test("quantileNormalize norm_x is exact at 2^40 magnitudes") {
    val df = Seq(("g", 1L, -1099511627775L), ("g", 2L, 1099511627775L),
      ("g", 3L, 0L))
      .toDF("g", "id", "v")
    val got = Stats.quantileNormalize(df, "g", col("v"), Seq("g", "id"), 16)
      .select("id", "norm_x").orderBy("id")
      .as[(Long, Double)].collect().toMap
    // bkt=0 rows read exactly mn — no .0001-style rounding residue
    assert(got(1L) === -1099511627775.0)
    assert(got(1L).toString === "-1.099511627775E12")
  }

  // ---- fuzz determinism: a cell regenerates byte-identically ----

  test("fuzz cells are replayable (same seed, same rows)") {
    def gen() = {
      val fam = Fuzz.families.find(_.name == "stats_fdiv").get
      val rng = new scala.util.Random(Fuzz.cellSeed("stats_fdiv", 0))
      fam.build(spark, rng).tables("t").collect().toSeq
    }
    assert(gen() === gen())
  }
}
