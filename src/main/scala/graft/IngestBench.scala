package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import graft.ingest.IngestJob

/** Ingest-throughput benchmark: times the full composed load-data
  * pipeline (schema-enforced JSONL scan → enrich → validate →
  * in-file dedup → idempotent anti-join upsert) over a synthesized
  * ENTSOE-shaped file, and a re-run (pure dedup path, 0 inserted).
  *
  * The reference's only published throughput facts are operational:
  * 500K records per insert batch and ~5 min per month-chunk of
  * extract+load on 1 vCPU (BASELINE.md). This main gives the
  * comparable number for this engine: records/second through the
  * complete validated load, reproducible with
  * `sbt "runMain graft.IngestBench [nRecords]"`.
  */
object IngestBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(1000000)
    val cpus = Defaults.cpus
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.ansi.enabled", "false")
      // off by default in Spark 4.1; prunes the big side of shuffled
      // inner/semi joins with a runtime bloom at 100 TB scale
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = Files.createTempDirectory("graft-ingest-bench")
    val file = dir.resolve("entsoe.jsonl")
    val runId = "550e8400-e29b-41d4-a716-446655440000"
    val w = Files.newBufferedWriter(file)
    var i = 0
    while (i < n) {
      // unique (timestamp, country, psr, plant) natural key per line:
      // one 2023 hourly series per plant, plant count grows with n so
      // timestamps never leave the past (the validator rejects future
      // event times, correctly)
      val ts = 1672531200000L + (i.toLong % 8760) * 3600000L
      val plant = s"Plant ${i / 8760}"
      val psr = s"B0${i % 3 + 1}"
      val cc = if (i % 2 == 0) "DE" else "FR"
      w.write(
        s"""{"extraction_run_id":"$runId","created_at_ms":1767282419683,"timestamp_ms":$ts,"country_code":"$cc","psr_type":"$psr","plant_name":"$plant","fuel_type":"Fossil Gas","data_type":"Actual","generation_mw":${(i % 1000) / 10.0},"resolution_minutes":60}""")
      w.newLine()
      i += 1
    }
    w.close()

    val table = dir.resolve("table").toString
    val t0 = System.nanoTime()
    val r1 = IngestJob.load(spark, "entsoe", file.toString, table)
    val loadSec = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val r2 = IngestJob.load(spark, "entsoe", file.toString, table)
    val rerunSec = (System.nanoTime() - t1) / 1e9

    println(
      s"""{"metric":"ingest","records":$n,"valid":${r1.report.valid},""" +
        s""""inserted":${r1.upsert.inserted},"load_sec":$loadSec,""" +
        s""""rec_per_sec":${(n / loadSec).toInt},""" +
        s""""rerun_sec":$rerunSec,"rerun_inserted":${r2.upsert.inserted}}""")
    spark.stop()
  }
}
