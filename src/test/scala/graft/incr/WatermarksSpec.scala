package graft.incr

import java.time.LocalDate
import graft.SparkSpec

/** Mirrors reference tests/test_incremental_extract.py:33-100. */
class WatermarksSpec extends SparkSpec {

  test("resume = latest + 1 day, clamped to min start") {
    val min = LocalDate.parse("2019-01-01")
    assert(Watermarks.resumeFrom(Some(LocalDate.parse("2024-06-15")), min) ==
      LocalDate.parse("2024-06-16"))
    assert(Watermarks.resumeFrom(Some(LocalDate.parse("2018-12-31")), min) == min)
    assert(Watermarks.resumeFrom(None, min) == min) // empty table → min start
  }

  test("override precedence: empty string falls through, malformed raises") {
    val fb = LocalDate.parse("2024-01-01")
    assert(Watermarks.resolveOverride(Some("2023-05-01"), fb) == LocalDate.parse("2023-05-01"))
    assert(Watermarks.resolveOverride(Some(""), fb) == fb)
    assert(Watermarks.resolveOverride(Some("  "), fb) == fb)
    assert(Watermarks.resolveOverride(None, fb) == fb)
    intercept[IllegalArgumentException] {
      Watermarks.resolveOverride(Some("05/01/2023"), fb)
    }
  }

  test("month windows cover the span with day-clamping") {
    val w = Watermarks.monthWindows(LocalDate.parse("2024-01-31"), LocalDate.parse("2024-03-15"))
    assert(w == Seq(
      (LocalDate.parse("2024-01-31"), LocalDate.parse("2024-02-28")),
      (LocalDate.parse("2024-02-29"), LocalDate.parse("2024-03-15")),
    ))
  }

  test("12-month soft cap boundary (reference :80-100)") {
    val s = LocalDate.parse("2023-01-01")
    assert(!Watermarks.windowTooLong(s, LocalDate.parse("2024-01-01")))
    assert(Watermarks.windowTooLong(s, LocalDate.parse("2024-01-02")))
  }
}
