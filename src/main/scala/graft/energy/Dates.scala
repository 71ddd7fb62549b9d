package graft.energy

import java.time.LocalDate
import scala.jdk.CollectionConverters._

/** Backfill date-range generation.
  *
  * Reference: `src/utils/dates.py:5-37` — inclusive day-by-day range with
  * `start <= end` validation.
  */
object Dates {
  /** Inclusive list of days from `start` to `end`. */
  def dateRange(start: LocalDate, end: LocalDate): Seq[LocalDate] = {
    require(!start.isAfter(end), s"start_date $start must be <= end_date $end")
    start.datesUntil(end.plusDays(1)).iterator().asScala.toSeq
  }

  def dateRange(start: String, end: String): Seq[LocalDate] =
    dateRange(LocalDate.parse(start), LocalDate.parse(end))
}
