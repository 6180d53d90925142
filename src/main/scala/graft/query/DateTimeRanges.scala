package graft.query

import java.time.{Instant, LocalDate, LocalDateTime, ZoneOffset}

/** Calendar-aware numeric range helpers over an epoch-seconds docvalue
  * column, mirroring the reference's DateTimeField
  * (/root/reference/lupyne/engine/documents.py:167-225): dates index as UTC
  * timestamps (double seconds); prefix/range/duration/within build
  * [[NumRanges]] queries with the same boundary arithmetic, incl. the
  * December → next-year rollover (documents.py:196-198).
  *
  * A "date prefix" is a time tuple: (year[, month[, day[, hour, min, sec]]]).
  */
object DateTimeRanges {

  /** UTC timestamp of a (possibly partial) time tuple, missing parts
    * defaulting to (month=1, day=1, 0:0:0) — DateTimeField.timestamp.
    */
  def timestamp(parts: Seq[Int]): Double = {
    val p = parts ++ Seq(1, 1, 0, 0, 0).drop(math.max(0, parts.length - 1))
    // offset construction normalizes overflowed tuples ((2024,2,30) → Mar 1)
    // exactly like the reference's calendar.timegm
    val dt = LocalDateTime.of(p(0), 1, 1, 0, 0, 0)
      .plusMonths(p(1) - 1).plusDays(p(2) - 1)
      .plusHours(p(3)).plusMinutes(p(4)).plusSeconds(p(5))
    dt.toEpochSecond(ZoneOffset.UTC).toDouble
  }

  def timestamp(d: LocalDate): Double =
    d.atStartOfDay.toEpochSecond(ZoneOffset.UTC).toDouble

  def timestamp(i: Instant): Double = i.toEpochMilli / 1000.0

  /** Half-open [start, stop) timestamp range (Query.ranges semantics). */
  def range(field: String, start: Option[Seq[Int]], stop: Option[Seq[Int]],
      includeUpper: Boolean = false): Query =
    NumRanges(field, Seq((start.map(timestamp), stop.map(timestamp))),
      includeLower = true, includeUpper = includeUpper)

  /** All timestamps within the calendar unit named by the prefix:
    * (1919) → year 1919; (1919, 8) → Aug 1919; (1919, 12) rolls to (1920, 1).
    */
  def prefix(field: String, parts: Seq[Int]): Query = {
    val stop =
      if (parts.length == 2 && parts(1) == 12) Seq(parts(0) + 1, 1)
      else parts.init :+ (parts.last + 1)
    range(field, Some(parts), Some(stop))
  }

  /** Range within a (possibly negative) day/second span of a date —
    * DateTimeField.duration: bounds sorted, upper inclusive.
    */
  def duration(field: String, date: LocalDateTime, days: Long = 0, seconds: Long = 0): Query = {
    val other = date.plusDays(days).plusSeconds(seconds)
    val (lo, hi) = if (other.isBefore(date)) (other, date) else (date, other)
    NumRanges(field,
      Seq((Some(lo.toEpochSecond(ZoneOffset.UTC).toDouble),
        Some(hi.toEpochSecond(ZoneOffset.UTC).toDouble))),
      includeLower = true, includeUpper = true)
  }

  /** Range within `days` of `asOf` (DateTimeField.within — the reference
    * uses now(); deterministic engines take the origin explicitly).
    */
  def within(field: String, asOf: LocalDateTime, days: Long): Query =
    duration(field, asOf, days = days)
}
