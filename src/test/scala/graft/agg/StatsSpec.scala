package graft.agg

import org.apache.spark.sql.functions._
import graft.SparkSpec

class StatsSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1706745600000L, "run1", true, 10L),
    (1709251200000L, "run1", true, 20L),
    (1577836800000L, "run2", false, 5L),
  ).toDF("timestamp_ms", "run_id", "success", "n")

  private def ts = Rollups.msToTs(col("timestamp_ms"))

  test("A6 distinct years ordered") {
    val y = Stats.distinctYears(df, ts).as[Int].collect().toSeq
    assert(y == Seq(2020, 2024))
  }

  test("A7 date range for one run") {
    val r = Stats.dateRange(df, ts, col("run_id") === "run1").head()
    assert(r.getString(0) == "2024-02-01" && r.getString(1) == "2024-03-01")
  }

  test("A8 latest dates with epoch fallback for empty tables") {
    val out = Stats.latestDates(Seq(
      ("full", df, ts),
      ("empty", df.filter(col("n") > 100), ts),
    )).collect().map(r => r.getString(0) -> r.getDate(1).toString).toMap
    assert(out("full") == "2024-03-01")
    assert(out("empty") == "1970-01-01")
  }

  test("A9 record counts") {
    val out = Stats.recordCounts(Seq("a" -> df, "b" -> df.limit(1)))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("a" -> 3L, "b" -> 1L))
  }

  test("A10 conditional summary: FILTER(WHERE success) semantics") {
    val out = Stats.conditionalSummary(df, col("run_id"), col("success"),
      col("n"), ts, ts).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out("run1") == ((2L, 2L, 30L)))
    assert(out("run2") == ((1L, 0L, 5L)))
  }
}
