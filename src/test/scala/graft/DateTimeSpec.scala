package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.query.{DateTimeRanges, NumRanges}

/** DateTimeField-parity boundary arithmetic (documents.py:167-225). */
class DateTimeSpec extends AnyFunSuite {

  def bounds(q: graft.query.Query): (Double, Double, Boolean) = q match {
    case NumRanges(_, Seq((Some(lo), Some(hi))), _, iu) => (lo, hi, iu)
    case other => fail(s"unexpected $other")
  }

  test("timestamp: partial tuples pad like the reference") {
    assert(DateTimeRanges.timestamp(Seq(1970)) === 0.0)
    assert(DateTimeRanges.timestamp(Seq(1970, 1, 2)) === 86400.0)
    assert(DateTimeRanges.timestamp(Seq(1970, 2)) === 31 * 86400.0)
    assert(DateTimeRanges.timestamp(Seq(1970, 1, 1, 0, 1, 30)) === 90.0)
  }

  test("prefix: calendar unit ranges incl. December rollover (documents.py:196-198)") {
    val (lo1, hi1, iu1) = bounds(DateTimeRanges.prefix("d", Seq(2024)))
    assert(lo1 === DateTimeRanges.timestamp(Seq(2024)) && hi1 === DateTimeRanges.timestamp(Seq(2025)) && !iu1)
    val (lo2, hi2, _) = bounds(DateTimeRanges.prefix("d", Seq(2024, 12)))
    assert(lo2 === DateTimeRanges.timestamp(Seq(2024, 12)) && hi2 === DateTimeRanges.timestamp(Seq(2025, 1)))
    val (lo3, hi3, _) = bounds(DateTimeRanges.prefix("d", Seq(2024, 2, 29)))
    assert(hi3 - lo3 === 86400.0) // leap day
  }

  test("duration: negative spans sort bounds; upper inclusive") {
    val origin = java.time.LocalDateTime.of(2024, 1, 10, 0, 0)
    val (lo, hi, iu) = bounds(DateTimeRanges.duration("d", origin, days = -3))
    assert(iu)
    assert(hi === DateTimeRanges.timestamp(Seq(2024, 1, 10)))
    assert(lo === DateTimeRanges.timestamp(Seq(2024, 1, 7)))
  }
}
