package graft

import org.apache.spark.sql.functions._

import graft.functions.{NLHolidays, ScalarOps}

/** Unit micro-fixtures for every scalar operator (SURVEY §5.2) —
  * especially the parity watch-list: hour-24 quirk, truncation at
  * negatives, the Mon=0 weekday shim across all 7 days.
  */
class ScalarOpsSpec extends SparkSpec {
  import spark.implicits._

  test("F1: YYYYMMDD int -> ISO string and DateType") {
    val df = Seq(20150101, 20151231).toDF("ymd")
    val got = df.select(
      ScalarOps.yyyymmddToIsoString($"ymd").as("s"),
      ScalarOps.yyyymmddToDate($"ymd").cast("string").as("d"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(got.toSeq == Seq(("2015-01-01", "2015-01-01"),
      ("2015-12-31", "2015-12-31")))
  }

  test("F2: sentinel replace and hour-24 quirk (no date shift)") {
    val df = Seq((24, -1), (1, 0), (23, 98)).toDF("h", "rh")
    val got = df.select(
      ScalarOps.hour24ToZero($"h").as("h2"),
      ScalarOps.replaceValue($"rh", -1, 0).as("rh2"))
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(got.toSeq == Seq((0, 0), (1, 0), (23, 98)))
  }

  test("F3: 0.1-rescale truncates toward zero (negative temps)") {
    val df = Seq(-55, 330, -5, 9).toDF("t")
    val got = df.select(ScalarOps.tenthsToUnit($"t").as("c"))
      .collect().map(_.getInt(0))
    // python int(-55*0.1) = int(-5.5) = -5 (toward zero), NOT floor -6
    assert(got.toSeq == Seq(-5, 33, 0, 0))
  }

  test("F4: comma-decimal locale parse") {
    val df = Seq("5,14429327107389", "52,0955725429849").toDF("s")
    val got = df.select(ScalarOps.localeDouble($"s").as("d"))
      .collect().map(_.getDouble(0))
    assert(got(0) == 5.14429327107389 && got(1) == 52.0955725429849)
  }

  test("F5: Fahrenheit->Celsius truncating, negatives toward zero") {
    val df = Seq(41.0, 32.0, 14.0, 30.0).toDF("f")
    val got = df.select(ScalarOps.f2c($"f").as("c")).collect().map(_.getInt(0))
    // int((14-32)*5/9) = int(-10.0) = -10; int((30-32)*5/9)=int(-1.11)= -1
    assert(got.toSeq == Seq(5, 0, -10, -1))
  }

  test("F7: multi-format parse with fallback; unparseable -> null") {
    val df = Seq("25-01-2015", "2015-01-25", "5-3-2015", "garbage").toDF("s")
    val got = df.select(ScalarOps.parseDateMulti($"s").cast("string").as("d"))
      .collect().map(r => Option(r.getString(0)))
    assert(got.toSeq == Seq(Some("2015-01-25"), Some("2015-01-25"),
      Some("2015-03-05"), None))
  }

  test("F9: weekday shim Mon=0..Sun=6 across a full week") {
    // 2015-01-05 is a Monday
    val df = (5 to 11).map(d => f"2015-01-$d%02d").toDF("s")
    val got = df.select(ScalarOps.weekdayMon0(to_date($"s")).as("w"))
      .collect().map(_.getInt(0))
    assert(got.toSeq == Seq(0, 1, 2, 3, 4, 5, 6))
  }

  test("F10+NLHolidays: known NL 2015 dates flagged") {
    val hol = NLHolidays.forYear(2015).map(_.toString).toSet
    assert(hol.contains("2015-01-01")) // Nieuwjaarsdag
    assert(hol.contains("2015-04-05")) // Easter Sunday
    assert(hol.contains("2015-04-06")) // Easter Monday
    assert(hol.contains("2015-04-27")) // King's Day (Monday, no shift)
    assert(hol.contains("2015-05-14")) // Ascension
    assert(hol.contains("2015-05-25")) // Whit Monday
    assert(hol.contains("2015-12-25") && hol.contains("2015-12-26"))
    // King's Day Sunday shift: 2014-04-27 was a Sunday -> observed 26th
    assert(NLHolidays.koningsdag(2014).toString == "2014-04-26")
    // pre-2014 Queen's Day
    assert(NLHolidays.koningsdag(2013).toString == "2013-04-30")
  }

  test("F8: timestamp -> SQL literal text with offset") {
    val df = Seq(java.sql.Timestamp.valueOf("2022-01-25 12:00:00")).toDF("t")
    val got = df.select(ScalarOps.timestampLiteral($"t")).first().getString(0)
    assert(got == "2022-01-25 12:00:00 +0000") // session tz pinned UTC
  }

  test("F13: prediction rescale truncates like int(pred*10)") {
    val df = Seq(0.999, 0.05, 1.0).toDF("p")
    val got = df.select(ScalarOps.rescalePrediction($"p").as("i"))
      .collect().map(_.getInt(0))
    assert(got.toSeq == Seq(9, 0, 10))
  }
}
