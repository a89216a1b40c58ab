package graft.io

import java.time.LocalDate

/** Incremental slice bounds (reference S3/S4/S7: yesterday slice
  * `load_311.py:20-24`, calendar-year slice `load_311.py:27-30`, monthly
  * backfill `load_history.py:4-17`). Pure [start, end) computations —
  * callers turn them into pushed scan predicates.
  */
object Slices {

  /** [yesterday 00:00, today 00:00) relative to `today`. */
  def yesterday(today: LocalDate): (String, String) =
    (today.minusDays(1).toString, today.toString)

  /** Calendar-year bounds [Jan 1, next Jan 1). */
  def year(y: Int): (String, String) =
    (LocalDate.of(y, 1, 1).toString, LocalDate.of(y + 1, 1, 1).toString)

  /** First day of the month containing `d`, and the first day after. */
  def month(d: LocalDate): (String, String) = {
    val m = d.withDayOfMonth(1)
    (m.toString, m.plusMonths(1).toString)
  }
}
