package graft.functions

import java.time.LocalDate

/** Dutch public holidays, computed (Easter arithmetic) rather than
  * hard-coded: the notebook uses `holidays.CountryHoliday('NL')`
  * (cell 6 json:81, lazy all-years), while the serving path hard-codes
  * ten 2022 dates (dags/utils.py:21-30). We generate the same set for
  * any year and ship it as a broadcastable dimension (SURVEY §2 F10).
  */
object NLHolidays {

  /** Western (Gregorian) Easter Sunday — Anonymous Gregorian algorithm. */
  def easterSunday(year: Int): LocalDate = {
    val a = year % 19
    val b = year / 100
    val c = year % 100
    val d = b / 4
    val e = b % 4
    val f = (b + 8) / 25
    val g = (b - f + 1) / 3
    val h = (19 * a + b - d - g + 15) % 30
    val i = c / 4
    val k = c % 4
    val l = (32 + 2 * e + 2 * i - h - k) % 7
    val m = (a + 11 * h + 22 * l) / 451
    val month = (h + l - 7 * m + 114) / 31
    val day = ((h + l - 7 * m + 114) % 31) + 1
    LocalDate.of(year, month, day)
  }

  /** King's Day (27 Apr, shifted to 26 Apr when the 27th is a Sunday);
    * Queen's Day (30 Apr, shifted to 29 Apr on Sundays) before 2014.
    */
  def koningsdag(year: Int): LocalDate = {
    val base =
      if (year >= 2014) LocalDate.of(year, 4, 27)
      else LocalDate.of(year, 4, 30)
    if (base.getDayOfWeek == java.time.DayOfWeek.SUNDAY) base.minusDays(1)
    else base
  }

  /** All NL public holidays for one year (the `holidays` package set:
    * Nieuwjaarsdag, Goede Vrijdag, Eerste/Tweede Paasdag, Koningsdag,
    * Bevrijdingsdag, Hemelvaart, Eerste/Tweede Pinksterdag,
    * Eerste/Tweede Kerstdag).
    */
  def forYear(year: Int): Seq[LocalDate] = {
    val easter = easterSunday(year)
    Seq(
      LocalDate.of(year, 1, 1),      // Nieuwjaarsdag
      easter.minusDays(2),           // Goede Vrijdag
      easter,                        // Eerste Paasdag
      easter.plusDays(1),            // Tweede Paasdag
      koningsdag(year),              // Koningsdag / Koninginnedag
      LocalDate.of(year, 5, 5),      // Bevrijdingsdag
      easter.plusDays(39),           // Hemelvaartsdag
      easter.plusDays(49),           // Eerste Pinksterdag
      easter.plusDays(50),           // Tweede Pinksterdag
      LocalDate.of(year, 12, 25),    // Eerste Kerstdag
      LocalDate.of(year, 12, 26))    // Tweede Kerstdag
  }

  def forYears(from: Int, to: Int): Seq[LocalDate] =
    (from to to).flatMap(forYear)

  /** ISO strings, handy for Column.isin / dimension-table literals. */
  def isoStrings(from: Int, to: Int): Seq[String] =
    forYears(from, to).map(_.toString)
}
