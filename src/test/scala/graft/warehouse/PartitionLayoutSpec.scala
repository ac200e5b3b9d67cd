package graft.warehouse

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The on-write layout that replaces the reference's b-tree indexes
  * (SURVEY.md §4): (year, month) Hive partitions + in-file
  * timestamp sort ⇒ month-window queries must prune partitions. */
class PartitionLayoutSpec extends SparkSpec {
  import spark.implicits._

  test("time-partitioned write prunes partitions for month-window reads") {
    val out = Files.createTempDirectory("graft-layout").toString + "/t"
    val df = Seq(
      (1706745600000L, "A", 1.0), // 2024-02
      (1706832000000L, "B", 2.0), // 2024-02
      (1709251200000L, "C", 3.0), // 2024-03
      (1577836800000L, "D", 4.0), // 2020-01
    ).toDF("timestamp_ms", "plant", "mwh")
    Warehouse.writeTimePartitioned(df, out)

    val t = spark.read.parquet(out)
    val feb = t.filter(col("_year") === 2024 && col("_month") === 2)
    assert(feb.count() == 2)
    val plan = feb.queryExecution.executedPlan.toString
    // static partition pruning visible in the scan
    assert(plan.contains("PartitionFilters") &&
      plan.contains("(_year") && plan.contains("(_month"))
    // layout: _year=2020 and _year=2024 dirs, months nested inside
    val yearDirs = new java.io.File(out).listFiles().filter(_.getName.startsWith("_year=")).map(_.getName).sorted
    assert(yearDirs.toSeq == Seq("_year=2020", "_year=2024"))
    assert(new java.io.File(out, "_year=2024").listFiles().count(_.getName.startsWith("_month=")) == 2)
  }
}
