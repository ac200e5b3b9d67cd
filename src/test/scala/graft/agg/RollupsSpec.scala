package graft.agg

import org.apache.spark.sql.functions._
import graft.SparkSpec

class RollupsSpec extends SparkSpec {
  import spark.implicits._

  // two months, two fuels, mixed resolutions (15-min and null→60)
  private def df = Seq(
    (1706745600000L, "Gas", 120.0, Some(15)), // 2024-02-01, 120MW×15min = 30 MWh
    (1706745600000L, "Gas", 60.0, None), // null res → 60 min → 60 MWh
    (1706832000000L, "Solar", 40.0, Some(15)), // 2024-02-02 → 10 MWh
    (1709251200000L, "Gas", 100.0, None), // 2024-03-01 → 100 MWh
  ).toDF("timestamp_ms", "fuel_type", "generation_mw", "resolution_minutes")

  test("A1 monthly MW→MWh rollup with conversion inside the aggregate") {
    val out = Rollups.monthly(
      df, Rollups.msToTs(col("timestamp_ms")),
      Seq("fuel_type" -> col("fuel_type")),
      Rollups.mwToMwh(col("generation_mw"), col("resolution_minutes")))
    val m = out.collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(m(("2024-02-01", "Gas")) == 90.0)
    assert(m(("2024-02-01", "Solar")) == 10.0)
    assert(m(("2024-03-01", "Gas")) == 100.0)
  }

  test("A4 coverage matrix stacks per-source month counts") {
    val out = Rollups.coverageMatrix(Seq(
      ("s1", df, Rollups.msToTs(col("timestamp_ms"))),
      ("s2", df.limit(1), Rollups.msToTs(col("timestamp_ms"))),
    ))
    val m = out.collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(m(("s1", "2024-02-01")) == 3 && m(("s1", "2024-03-01")) == 1)
    assert(m(("s2", "2024-02-01")) == 1)
  }

  test("A5 multi-metric monthly emits sum/count/avg/max") {
    val out = Rollups.multiMetricMonthly(
      df, Rollups.msToTs(col("timestamp_ms")),
      Seq("fuel_type" -> col("fuel_type")), col("generation_mw"))
    val gas = out.filter(col("month") === "2024-02-01" && col("fuel_type") === "Gas").head()
    assert(gas.getDouble(2) == 180.0) // sum
    assert(gas.getLong(3) == 2) // count
    assert(gas.getDouble(4) == 90.0) // avg
    assert(gas.getDouble(5) == 120.0) // max
  }

  test("month bucket is the reference TO_CHAR YYYY-MM-01 form in UTC") {
    val out = df.select(Rollups.monthStr(Rollups.msToTs(col("timestamp_ms"))).as("m"))
      .distinct().as[String].collect().toSet
    assert(out == Set("2024-02-01", "2024-03-01"))
  }
}
