package graft.agg

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ingest.IngestJob
import graft.warehouse.Warehouse

/** All eight sources load end-to-end and stack into the harmonized
  * envelope view. */
class HarmonizeSpec extends SparkSpec {

  private val runId = "550e8400-e29b-41d4-a716-446655440000"
  private val now = 1767282419683L
  private val ts = 1767196019683L

  /** One representative valid record per source (FIXTURES.md §A). */
  private val records: Map[String, String] = Map(
    "npp" -> s"""{"extraction_run_id":"$runId","created_at_ms":$now,"timestamp_ms":$ts,"plant":"Kudankulam","plant_and_unit":"Kudankulam Unit 1","unit":"Unit 1","generation_mwh":1000.5,"resolution_minutes":1440}""",
    "eia" -> s"""{"extraction_run_id":"$runId","created_at_ms":$now,"timestamp_ms":$ts,"utility_id":"195","plant_code":"3","generator_id":"A2ST","state":"AL","fuel_source":"NG","prime_mover":"CA","energy_source":"NG","net_generation_mwh":129296.0,"resolution_minutes":null}""",
    "entsoe" -> s"""{"extraction_run_id":"$runId","created_at_ms":$now,"timestamp_ms":$ts,"country_code":"DE","psr_type":"B04","plant_name":"Lichterfelde GUD","fuel_type":"Fossil Gas","data_type":"Actual","generation_mw":200.75,"resolution_minutes":60}""",
    "ons" -> s"""{"extraction_run_id":"$runId","created_at_ms":$now,"timestamp_ms":$ts,"plant":"Itaipu","ons_plant_id":"1","fuel_type":"Hydro","generation_mwh":5000.0,"resolution_minutes":60}""",
    "oe" -> s"""{"extraction_run_id":"$runId","created_at_ms":$now,"timestamp_ms":$ts,"network_code":"NEM","fueltech":"coal_black","generation_mwh":100.0,"resolution_minutes":1440}""",
    "oe_facility" -> s"""{"extraction_run_id":"$runId","created_at_ms":$now,"timestamp_ms":$ts,"network_code":"NEM","facility_code":"BAYSW","facility_name":"Bayswater","fueltech":"coal_black","latitude":-32.4,"longitude":150.9,"generation_mwh":50.0,"resolution_minutes":1440}""",
    "occto" -> s"""{"extraction_run_id":"$runId","created_at_ms":$now,"timestamp_ms":$ts,"plant":"Kashima","unit":"1","fuel_type":"LNG","area_name":"Tokyo","generation_mwh":300.0,"resolution_minutes":30}""",
    "chile" -> s"""{"extraction_run_id":"$runId","created_at_ms":$now,"timestamp_ms":$ts,"plant":"TER HORNITOS","chile_plant_id":"395","fuel_type":"Carbon","generation_mwh":163.13,"resolution_minutes":60}""",
  )

  test("all 8 sources load and harmonize into one envelope view") {
    val wh = Files.createTempDirectory("graft-harm").toString
    records.foreach { case (source, line) =>
      val f = Files.createTempDirectory("graft-h").resolve(s"$source.jsonl")
      Files.writeString(f, line)
      val r = IngestJob.load(spark, source, f.toString,
        Warehouse.tablePath(wh, source), runId, now)
      assert(r.report.valid == 1, s"$source: ${r.report}")
      assert(r.upsert.inserted == 1, s"$source")
    }
    val view = Harmonize.harmonizedView(spark, wh)
    assert(view.count() == 8)
    assert(view.select("source").distinct().count() == 8)
    // ENTSOE MW→MWh conversion applied: 200.75 MW × 60/60 min = 200.75 MWh
    assert(view.filter(col("source") === "entsoe")
      .select("generation_mwh").head().getDouble(0) == 200.75)
    // harmonized monthly rollup runs over the stacked view
    val monthly = Rollups.monthly(view, Rollups.msToTs(col("timestamp_ms")),
      Seq("source" -> col("source")), col("generation_mwh"))
    assert(monthly.count() == 8)
  }
}
