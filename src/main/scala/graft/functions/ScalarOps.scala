package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar operators F1–F13 from SURVEY.md §2, each a pure
  * `Column => Column` built from codegen'd Catalyst expressions
  * (no UDFs). Reference citations are to /root/reference.
  */
object ScalarOps {

  /** F1 — YYYYMMDD int → DateType.
    * Ref: Traffic-Prediction-Modelling.ipynb cell 2 (json:33):
    * `str(x)[0:4]+"-"+str(x)[4:6]+"-"+str(x)[6:8]`.
    */
  def yyyymmddToDate(c: Column): Column =
    to_date(c.cast("string"), "yyyyMMdd")

  /** F1 (string-identical variant) — the reference keeps the ISO
    * string, not a date; byte-identical rebuild.
    */
  def yyyymmddToIsoString(c: Column): Column = {
    val s = c.cast("string")
    concat_ws("-", substring(s, 1, 4), substring(s, 5, 2), substring(s, 7, 2))
  }

  /** F2 — value replace, e.g. KNMI RH sentinel -1 ("<0.05mm") → 0.
    * Ref: cell 2 (json:35-36).
    */
  def replaceValue(c: Column, from: Any, to: Any): Column =
    when(c === lit(from), lit(to)).otherwise(c)

  /** F2 quirk — hour 24 → hour 0 of the SAME day (the reference does
    * NOT advance the date; parity requires preserving that).
    */
  def hour24ToZero(c: Column): Column = replaceValue(c, 24, 0)

  /** F3 — 0.1-unit rescale with truncating int cast (toward zero,
    * like python int()). Ref: cell 2 (json:37) `int(T*0.1)`.
    * Requires non-ANSI mode (GraftSession.tune) for truncating cast.
    */
  def tenthsToUnit(c: Column): Column = (c * 0.1).cast("int")

  /** F4 — locale decimal parse: "5,1442" → 5.1442.
    * Ref: data/extract_from_raw_data.py:30-31.
    */
  def localeDouble(c: Column): Column =
    regexp_replace(c, ",", "\\.").cast("double")

  /** F5 — Fahrenheit→Celsius with truncating int, `int((f-32)*5/9)`.
    * Ref: dags/utils.py:139-140.
    */
  def f2c(c: Column): Column = ((c - lit(32)) * lit(5) / lit(9)).cast("int")

  /** F6 — conditional unit normalize (only convert when unit is F).
    * Ref: dags/utils.py:185-189.
    */
  def normalizeTemp(valueCol: Column, unitCol: Column): Column =
    when(unitCol === "F", f2c(valueCol)).otherwise(valueCol.cast("int"))

  /** F7 — multi-format date parse with fallback: try d-M-yyyy, then
    * yyyy-M-d (pandas tries '%d-%m-%Y' then '%Y-%m-%d';
    * ref: extract_from_raw_data.py:35-38). Non-ANSI mode yields null
    * on mismatch, so coalesce expresses the try/except chain.
    *
    * Domain note (fuzz r13): the year field must be exactly 4 digits.
    * Spark's strict `yyyy` rejects 1–3-digit years that strptime `%Y`
    * accepts ('1-1-1' is null here, 0001-01-01 under DuckDB/pandas
    * strptime) — an oracle mirror must gate on the 4-digit-year shape.
    */
  def parseDateMulti(c: Column): Column =
    coalesce(to_date(c, "d-M-yyyy"), to_date(c, "yyyy-M-d"))

  /** F7 (dispatch variant) — same result as [[parseDateMulti]] but
    * picks the format per row instead of parse-fail-fallback. The
    * formats are disjoint on the FIRST separator position: d-M-yyyy
    * puts '-' at position 2 or 3 (1–2 digit day), while yyyy-M-d has
    * four year digits first — and a 1–2 digit "year" can never satisfy
    * its strict yyyy field, so a row whose pos-2/3 char is '-' only
    * ever parses as d-M-yyyy. Two positional char compares (branch-
    * cheap, inside codegen — not a per-row regex: the earlier
    * `rlike("^\\d{4}-")` dispatch measured SLOWER than the plain
    * coalesce chain, +39% on q_f7 at sf0.1) route each row to the one
    * format that can match it, skipping the exception-driven failed
    * parse. PropertySpec asserts equality with the coalesce chain over
    * both formats and malformed inputs (both render null).
    */
  def parseDateMultiFast(c: Column): Column =
    when(substring(c, 2, 1) === "-" || substring(c, 3, 1) === "-",
      to_date(c, "d-M-yyyy"))
      .otherwise(to_date(c, "yyyy-M-d"))

  /** F8 — timestamp → SQL literal text `%Y-%m-%d %H:%M:%S %z`.
    * Ref: dags/utils.py:211,272.
    */
  def timestampLiteral(c: Column): Column =
    date_format(c, "yyyy-MM-dd HH:mm:ss Z")

  /** F9 — weekday with pandas numbering Mon=0..Sun=6. Spark's
    * dayofweek is Sun=1..Sat=7; shim (d+5) % 7.
    * Ref: cell 6 (json:78), dags/utils.py:241.
    */
  def weekdayMon0(c: Column): Column = (dayofweek(c) + lit(5)) % lit(7)

  /** F10 — holiday membership against a fixed date list.
    * Ref: dags/utils.py:21-30,242 (hard-coded NL-2022 list);
    * notebook cell 6 (json:81) uses the `holidays` package.
    */
  def inDateList(c: Column, dates: Seq[String]): Column =
    c.isin(dates.map(java.sql.Date.valueOf): _*)

  /** F11 — 0/1 int → boolean. Ref: cell 6 (json:79). */
  def toBool(c: Column): Column = c.cast("boolean")

  /** F13 — prediction rescale `int(pred * 10)`.
    * Ref: dags/utils.py:273.
    */
  def rescalePrediction(c: Column): Column = (c * lit(10)).cast("int")
}
