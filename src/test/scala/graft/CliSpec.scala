package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** E2E drive of the management CLI (reference
  * database_management.py examples section): setup → load-data
  * (strict + report) → stats → aggregate-export → clear-table,
  * asserting exit codes and on-disk effects. */
class CliSpec extends SparkSpec {

  private val runId = "550e8400-e29b-41d4-a716-446655440000"
  private val now = 1767282419683L

  private def entsoe(ts: Long, plant: String, mw: Double): String =
    s"""{"extraction_run_id":"$runId","created_at_ms":$now,"timestamp_ms":$ts,"country_code":"DE","psr_type":"B04","plant_name":"$plant","fuel_type":"Fossil Gas","data_type":"Actual","generation_mw":$mw,"resolution_minutes":60}"""

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("setup + load-data + stats + aggregate-export + clear-table lifecycle") {
    val wh = tmp("graft-cli-wh")
    val jsonl = Files.createTempDirectory("graft-cli-in").resolve("in.jsonl")
    Files.writeString(jsonl, Seq(
      entsoe(1577836800000L, "Plant A", 100.0), // 2020-01
      entsoe(1577840400000L, "Plant A", 300.0), // 2020-01
      entsoe(1609459200000L, "Plant B", 50.0), //  2021-01
    ).mkString("\n"))

    assert(Cli.run(spark, Seq("setup", "--warehouse", wh)) == 0)
    assert(spark.read.parquet(s"$wh/entsoe_generation_data").isEmpty)

    val report = s"${tmp("graft-cli-rep")}/report.json"
    assert(Cli.run(spark, Seq("load-data", "entsoe", jsonl.toString,
      "--warehouse", wh, "--validation-report", report)) == 0)
    assert(spark.read.parquet(s"$wh/entsoe_generation_data").count() == 3)
    assert(spark.read.parquet(s"$wh/extraction_metadata").count() == 1)
    val rep = spark.read.json(report)
    assert(rep.select("total_records").head().getLong(0) == 3)
    assert(rep.select("invalid_records").head().getLong(0) == 0)

    assert(Cli.run(spark, Seq("stats", "--warehouse", wh)) == 0)

    val out = tmp("graft-cli-export")
    assert(Cli.run(spark, Seq("aggregate-export", "entsoe", "--warehouse", wh,
      "--output-dir", out, "--granularity", "country-fuel")) == 0)
    val exported = spark.read.option("header", "true").csv(out)
    assert(exported.columns.contains("total_generation_mwh"))
    // 2020-01 rolls the two Plant-A-hours into one country-fuel row
    val jan2020 = exported.filter(col("month") === "2020-01-01")
    assert(jan2020.count() == 1)
    assert(jan2020.select("total_generation_mwh").head().getString(0).toDouble == 400.0)
    // per-year file layout: year= Hive partitions
    assert(new java.io.File(out).listFiles().map(_.getName).count(_.startsWith("year=")) == 2)

    // other granularities: plant carries plant_name; country collapses psr
    val outPlant = tmp("graft-cli-export-plant")
    assert(Cli.run(spark, Seq("aggregate-export", "entsoe", "--warehouse", wh,
      "--output-dir", outPlant, "--granularity", "plant")) == 0)
    val pp = spark.read.option("header", "true").csv(outPlant)
    assert(pp.columns.contains("plant_name"))
    // Plant A's two 2020-01 hours roll into one per-plant row
    val pJan = pp.filter(col("month") === "2020-01-01" && col("plant_name") === "Plant A")
    assert(pJan.count() == 1)
    assert(pJan.select("total_generation_mwh").head().getString(0).toDouble == 400.0)
    assert(pJan.select("hours_of_data").head().getString(0).toLong == 2)
    val outCountry = tmp("graft-cli-export-country")
    assert(Cli.run(spark, Seq("aggregate-export", "entsoe", "--warehouse", wh,
      "--output-dir", outCountry, "--granularity", "country")) == 0)
    val cc = spark.read.option("header", "true").csv(outCountry)
    assert(!cc.columns.contains("psr_type") && cc.columns.contains("country_code"))
    val cJan = cc.filter(col("month") === "2020-01-01")
    assert(cJan.count() == 1) // one DE row, no double counting
    assert(cJan.select("total_generation_mwh").head().getString(0).toDouble == 400.0)

    assert(Cli.run(spark, Seq("clear-table", "entsoe", "--warehouse", wh)) == 1) // no --confirm
    assert(Cli.run(spark, Seq("clear-table", "entsoe", "--confirm", "--warehouse", wh)) == 0)
    assert(spark.read.parquet(s"$wh/entsoe_generation_data").isEmpty)
  }

  test("refresh-views and backfill round out the operational surface") {
    val wh = tmp("graft-cli-rv")
    val jsonl = Files.createTempDirectory("graft-cli-rv-in").resolve("in.jsonl")
    Files.writeString(jsonl, Seq(
      entsoe(1577836800000L, "Plant A", 100.0),
      entsoe(1609459200000L, "Plant B", 50.0),
    ).mkString("\n"))
    Cli.run(spark, Seq("setup", "entsoe", "--warehouse", wh))
    assert(Cli.run(spark, Seq("load-data", "entsoe", jsonl.toString, "--warehouse", wh)) == 0)

    assert(Cli.run(spark, Seq("refresh-views", "entsoe", "--warehouse", wh)) == 0)
    val mv = spark.read.parquet(s"$wh/mv_entsoe_monthly")
    assert(mv.count() == 2) // one row per (month, fuel)

    // metadata row has NULL dates until backfilled from the fact table
    val before = spark.read.parquet(s"$wh/extraction_metadata")
    assert(before.filter(col("start_date").isNull).count() == 1)
    assert(Cli.run(spark, Seq("backfill", "entsoe", "--warehouse", wh)) == 0)
    val after = spark.read.parquet(s"$wh/extraction_metadata").head()
    assert(after.getAs[String]("start_date") == "2020-01-01")
    assert(after.getAs[String]("end_date") == "2021-01-01")
  }

  test("compact merges the part-files accreted by repeated loads; bad source exits 1") {
    val wh = tmp("graft-cli-compact")
    Cli.run(spark, Seq("setup", "entsoe", "--warehouse", wh))
    // two loads with distinct rows → two appends' worth of part-files
    for (batch <- 0 to 1) {
      val jsonl = Files.createTempDirectory(s"graft-cli-cp$batch").resolve("in.jsonl")
      Files.writeString(jsonl, (0 until 4)
        .map(i => entsoe(1577836800000L + (batch * 4 + i) * 3600000L, s"P$batch$i", 10.0))
        .mkString("\n"))
      assert(Cli.run(spark, Seq("load-data", "entsoe", jsonl.toString, "--warehouse", wh)) == 0)
    }
    val table = new java.io.File(s"$wh/entsoe_generation_data")
    def partCount = table.listFiles().count(_.getName.startsWith("part-"))
    // the idempotent append rewrites whole tables, so fragment the
    // stored table explicitly (what a partitioned multi-executor
    // append produces) before compacting
    val frag = tmp("graft-cli-frag")
    spark.read.parquet(table.toString).repartition(6).write
      .mode("overwrite").parquet(frag)
    org.apache.commons.io.FileUtils.deleteDirectory(table)
    org.apache.commons.io.FileUtils.moveDirectory(new java.io.File(frag), table)
    assert(partCount > 1)
    assert(Cli.run(spark, Seq("compact", "entsoe", "--warehouse", wh)) == 0)
    assert(partCount == 1) // 8 tiny rows fit one 128 MB target file
    assert(spark.read.parquet(table.toString).count() == 8)
    assert(Cli.run(spark, Seq("compact", "nope", "--warehouse", wh)) == 1)
  }

  test("maintenance-lock triage: crashed rewrite -> append refused -> status -> unlock --force -> append ok") {
    val wh = tmp("graft-cli-lock")
    assert(Cli.run(spark, Seq("setup", "entsoe", "--warehouse", wh)) == 0)
    val jsonl = Files.createTempDirectory("graft-cli-lk").resolve("in.jsonl")
    Files.writeString(jsonl, entsoe(1577836800000L, "Plant L", 10.0))
    assert(Cli.run(spark, Seq("load-data", "entsoe", jsonl.toString, "--warehouse", wh)) == 0)

    // simulate a maintenance crash: the failed rewrite keeps its lock
    val fs = org.apache.hadoop.fs.FileSystem
      .get(spark.sparkContext.hadoopConfiguration)
    val table = graft.warehouse.Warehouse.declaredTable(wh, "entsoe")._1
    intercept[RuntimeException] {
      graft.warehouse.MaintenanceLock.withLock(fs, table, "compact") {
        throw new RuntimeException("rewrite died mid-flight")
      }
    }

    // writers refuse while the lock is held (load fails, exit 1)
    val jsonl2 = Files.createTempDirectory("graft-cli-lk2").resolve("in.jsonl")
    Files.writeString(jsonl2, entsoe(1577840400000L, "Plant M", 20.0))
    assert(Cli.run(spark, Seq("load-data", "entsoe", jsonl2.toString, "--warehouse", wh)) == 1)

    // status reports the holding op; unlock without --force refuses
    val st = graft.warehouse.MaintenanceLock.status(fs, table)
    assert(st.exists(_.op == "compact"))
    assert(st.flatMap(_.ageMs(System.currentTimeMillis())).exists(_ >= 0))
    assert(Cli.run(spark, Seq("maintenance-status", "entsoe", "--warehouse", wh)) == 0)
    assert(Cli.run(spark, Seq("unlock", "entsoe", "--warehouse", wh)) == 1)
    assert(graft.warehouse.MaintenanceLock.isLocked(fs, table))

    // forced unlock clears it; the append goes through again
    assert(Cli.run(spark, Seq("unlock", "entsoe", "--warehouse", wh, "--force")) == 0)
    assert(!graft.warehouse.MaintenanceLock.isLocked(fs, table))
    assert(Cli.run(spark, Seq("load-data", "entsoe", jsonl2.toString, "--warehouse", wh)) == 0)
    assert(spark.read.parquet(table).count() == 2)
    // status/unlock on an unlocked table are clean no-ops; unknown table exits 1
    assert(Cli.run(spark, Seq("maintenance-status", "entsoe", "--warehouse", wh)) == 0)
    assert(Cli.run(spark, Seq("unlock", "entsoe", "--warehouse", wh)) == 0)
    assert(Cli.run(spark, Seq("maintenance-status", "nope", "--warehouse", wh)) == 1)
  }

  test("update-schema and compact reach the reference tables, not just fact sources") {
    val wh = tmp("graft-cli-ref-maint")
    assert(Cli.run(spark, Seq("setup", "--warehouse", wh)) == 0) // creates both families
    assert(Cli.run(spark, Seq("update-schema", "eia_generator_info", "--warehouse", wh)) == 0)
    assert(Cli.run(spark, Seq("compact", "gcpt_coal_metadata", "--warehouse", wh)) == 0)
    // 'all' sweeps fact sources AND reference tables without error
    assert(Cli.run(spark, Seq("update-schema", "--warehouse", wh)) == 0)
  }

  test("strict mode fails the load on invalid records, lax mode passes (database_management.py:172-175)") {
    val wh = tmp("graft-cli-strict")
    val jsonl = Files.createTempDirectory("graft-cli-in2").resolve("bad.jsonl")
    Files.writeString(jsonl, Seq(
      entsoe(1577836800000L, "Plant A", 100.0),
      s"""{"extraction_run_id":"$runId","created_at_ms":$now,"timestamp_ms":1577836800000,"country_code":"DE","psr_type":"B04","plant_name":"Bad","fuel_type":"Fossil Gas","data_type":"Actual","generation_mw":-1.0,"resolution_minutes":60}""",
    ).mkString("\n"))
    Cli.run(spark, Seq("setup", "entsoe", "--warehouse", wh))
    assert(Cli.run(spark, Seq("load-data", "entsoe", jsonl.toString,
      "--warehouse", wh, "--strict")) == 1)
    // the valid record still landed before the gate (reference writes
    // then fails; database_management.py checks the report post-insert)
    assert(spark.read.parquet(s"$wh/entsoe_generation_data").count() == 1)
    val wh2 = tmp("graft-cli-lax")
    Cli.run(spark, Seq("setup", "entsoe", "--warehouse", wh2))
    assert(Cli.run(spark, Seq("load-data", "entsoe", jsonl.toString,
      "--warehouse", wh2)) == 0)
    // a file of pure garbage must fail strict mode, not sail through
    // with total=0
    val garbage = Files.createTempDirectory("graft-cli-in3").resolve("garbage.jsonl")
    Files.writeString(garbage, "not json\n{\"truncated\": ")
    val wh3 = tmp("graft-cli-garbage")
    Cli.run(spark, Seq("setup", "entsoe", "--warehouse", wh3))
    assert(Cli.run(spark, Seq("load-data", "entsoe", garbage.toString,
      "--warehouse", wh3, "--strict")) == 1)
  }

  test("argument errors return exit 1: unknown command, missing warehouse, bad source, missing file") {
    assert(Cli.run(spark, Seq("bogus")) == 1)
    assert(Cli.run(spark, Seq("load-data", "entsoe", "/nope.jsonl")) == 1) // no --warehouse
    val wh = tmp("graft-cli-err")
    assert(Cli.run(spark, Seq("load-data", "mystery", "/nope.jsonl", "--warehouse", wh)) == 1)
    assert(Cli.run(spark, Seq("load-data", "entsoe", "/nope.jsonl", "--warehouse", wh)) == 1)
    assert(Cli.run(spark, Seq("aggregate-export", "npp", "--warehouse", wh, "--output-dir", "/tmp/x")) == 1)
    // table never created under this warehouse → failure becomes exit 1
    assert(Cli.run(spark, Seq("aggregate-export", "entsoe", "--warehouse", wh,
      "--output-dir", "/tmp/x")) == 1)
    // update-schema needs a warehouse too, and a created table
    assert(Cli.run(spark, Seq("update-schema", "entsoe")) == 1)
    assert(Cli.run(spark, Seq("update-schema", "entsoe", "--warehouse", wh)) == 1)
  }

  test("update-schema evolves a legacy-shaped table in place (database_management.py:68-102)") {
    val wh = tmp("graft-cli-evolve")
    // simulate a table written under an OLDER schema: entsoe before the
    // data_type column existed and with generation_mw stored as float
    import spark.implicits._
    val legacy = Seq(
      (runId, now, 1577836800000L, "DE", "B04", "Plant A", "Fossil Gas", 100.5f, 60),
      (runId, now, 1609459200000L, "FR", "B14", "Plant B", "Nuclear", 900.25f, 60),
    ).toDF("extraction_run_id", "created_at_ms", "timestamp_ms", "country_code",
      "psr_type", "plant_name", "fuel_type", "generation_mw", "resolution_minutes")
    legacy.write.parquet(s"$wh/entsoe_generation_data")

    assert(Cli.run(spark, Seq("update-schema", "entsoe", "--warehouse", wh)) == 0)
    val evolved = spark.read.parquet(s"$wh/entsoe_generation_data")
    // declared order + declared types (data_type added, measure re-cast)
    assert(evolved.schema.fieldNames.toSeq ==
      graft.schema.Schemas.entsoe.fieldNames.toSeq)
    assert(evolved.schema("generation_mw").dataType ==
      org.apache.spark.sql.types.DoubleType)
    // rows preserved, added column NULL-backfilled, values intact
    assert(evolved.count() == 2)
    assert(evolved.filter(col("data_type").isNull).count() == 2)
    assert(evolved.filter(col("plant_name") === "Plant A")
      .select("generation_mw").head().getDouble(0) == 100.5)
    // idempotent: running again reports no changes and keeps the data
    assert(Cli.run(spark, Seq("update-schema", "all", "--warehouse", wh)) == 0)
    assert(spark.read.parquet(s"$wh/entsoe_generation_data").count() == 2)
    // no leftover swap directories
    val names = new java.io.File(wh).listFiles().map(_.getName).toSet
    assert(!names.exists(n => n.endsWith(".new") || n.endsWith(".old")))

    // a stored column the declaration no longer has is removed but
    // REPORTED — never silently destroyed
    val withExtra = spark.read.parquet(s"$wh/entsoe_generation_data")
      .withColumn("legacy_flag", lit(1))
    withExtra.write.mode("overwrite").parquet(s"$wh/entsoe_generation_data.tmp")
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$wh/entsoe_generation_data"), true)
    fs.rename(new org.apache.hadoop.fs.Path(s"$wh/entsoe_generation_data.tmp"),
      new org.apache.hadoop.fs.Path(s"$wh/entsoe_generation_data"))
    val r = graft.warehouse.Warehouse.updateSchema(spark, wh, "entsoe")
    assert(r.dropped == Seq("legacy_flag"))
    assert(r.rows == 2)
  }
}
