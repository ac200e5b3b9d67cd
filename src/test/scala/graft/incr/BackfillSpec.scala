package graft.incr

import graft.SparkSpec

/** Mirrors reference backfill_extraction_dates.py:47-103. */
class BackfillSpec extends SparkSpec {
  import spark.implicits._

  test("fills only NULL dates from per-run fact ranges") {
    val fact = Seq(
      ("run1", 1706745600000L), // 2024-02-01
      ("run1", 1709251200000L), // 2024-03-01
      ("run2", 1577836800000L), // 2020-01-01
    ).toDF("extraction_run_id", "timestamp_ms")
    val meta = Seq(
      ("run1", None: Option[String], None: Option[String]),
      ("run2", Some("2019-12-31"), Some("2020-01-02")), // preexisting, untouched
      ("run3", None: Option[String], None: Option[String]), // no facts → stays null
    ).toDF("extraction_run_id", "start_date", "end_date")

    val out = Backfill.backfillDates(meta, fact)
      .collect()
      .map(r => r.getString(0) -> ((Option(r.getString(1)), Option(r.getString(2)))))
      .toMap
    assert(out("run1") == ((Some("2024-02-01"), Some("2024-03-01"))))
    assert(out("run2") == ((Some("2019-12-31"), Some("2020-01-02"))))
    assert(out("run3") == ((None, None)))
  }
}
