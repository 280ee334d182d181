package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.parse.PageParser
import java.time.LocalDateTime

/** F4 date-string ladder, pinned against the reference parsers run this
  * session (generic.py:210-250 + inven.py:216-244). The ladder is the
  * union of the site ladders with the reference's priority order: ISO
  * (trailing Z / offset tolerated) → YYYY sep M sep D [H:MM] →
  * M sep D sep YYYY → YY sep M sep D (+2000, date-only).
  * One deliberate divergence: the reference generic parser's separator
  * class `[.-/]` is a char RANGE (.-/) that accidentally excludes '-';
  * we treat '-' as a valid separator (the functional spec).
  */
class DateLadderSpec extends AnyFunSuite {
  private def p(s: String) = PageParser.parseDate(s)

  test("ISO datetime attrs incl. trailing Z and offsets (fromisoformat semantics)") {
    assert(p("2024-01-15T10:30:00Z").contains(LocalDateTime.of(2024, 1, 15, 10, 30)))
    assert(p("2024-01-15T10:30:00+09:00").contains(LocalDateTime.of(2024, 1, 15, 10, 30)))
    assert(p("2024-01-15T10:30:45").contains(LocalDateTime.of(2024, 1, 15, 10, 30, 45)))
  }

  test("YYYY sep M sep D with optional time (inven ladder rung 1-2)") {
    assert(p("2024.01.15 10:30").contains(LocalDateTime.of(2024, 1, 15, 10, 30)))
    assert(p("2024-3-7").contains(LocalDateTime.of(2024, 3, 7, 0, 0)))
    assert(p("2024/12/31").contains(LocalDateTime.of(2024, 12, 31, 0, 0)))
  }

  test("M sep D sep YYYY (generic US order)") {
    assert(p("01/15/2024").contains(LocalDateTime.of(2024, 1, 15, 0, 0)))
    assert(p("01-15-2024").contains(LocalDateTime.of(2024, 1, 15, 0, 0)))
  }

  test("2-digit year + 2000, date-only (inven ladder rung 3)") {
    assert(p("24.01.15").contains(LocalDateTime.of(2024, 1, 15, 0, 0)))
    // time is NOT captured by the 2-digit rung (reference pattern has none)
    assert(p("24.1.5 9:05").contains(LocalDateTime.of(2024, 1, 5, 0, 0)))
    assert(p("99.12.31").contains(LocalDateTime.of(2099, 12, 31, 0, 0)))
  }

  test("invalid and empty inputs fall through to None (ValueError continue)") {
    assert(p("no date here").isEmpty)
    assert(p("2024.13.45").isEmpty)
    assert(p("").isEmpty)
  }

  test("ladder priority: 4-digit year wins over a 2-digit-year submatch") {
    // '24.01.15' inside '2024.01.15' must NOT be read as 2044-01-15
    assert(p("2024.01.15").contains(LocalDateTime.of(2024, 1, 15, 0, 0)))
  }
}
