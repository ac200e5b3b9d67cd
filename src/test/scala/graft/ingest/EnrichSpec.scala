package graft.ingest

import org.apache.spark.sql.functions._
import graft.SparkSpec

class EnrichSpec extends SparkSpec {
  import spark.implicits._

  test("psr map overwrites fuel_type whenever psr_type is known (reference database.py:667-670)") {
    val df = Seq(
      ("B04", "Unknown"), // repaired
      ("B16", "Wrong"), // repaired (map always wins)
      ("B99", "Kept"), // unknown code → keep original
    ).toDF("psr_type", "fuel_type")
    val out = Enrich.fixFuelTypeFromPsr(df).select("fuel_type").as[String].collect().toSeq
    assert(out == Seq("Fossil Gas", "Solar", "Kept"))
  }

  test("suffix strip: data-type then fuel-type, longest-first, one each (database.py:672-682)") {
    val cases = Seq(
      "Plant_Actual Aggregated" -> "Plant",
      "Plant_Actual Consumption" -> "Plant",
      "Plant_Fossil Gas" -> "Plant",
      // longest-first: must strip 'Fossil Brown coal/Lignite', not stop at a shorter match
      "Plant_Fossil Brown coal/Lignite" -> "Plant",
      // one from each family, applied data-type first then fuel-type
      "Plant_Solar_Actual Aggregated" -> "Plant",
      "NoSuffix" -> "NoSuffix",
      // only one fuel suffix stripped
      "Plant_Solar_Solar" -> "Plant_Solar",
    )
    val out = cases.map(_._1).toDF("v")
      .select(Enrich.stripPlantSuffixes(col("v")).as("r")).as[String].collect().toSeq
    assert(out == cases.map(_._2))
  }

  test("npp legacy rename: date (unix s) → timestamp_ms, scrape_id dropped") {
    val df = Seq((1700000000L, "x", "P")).toDF("date", "scrape_id", "plant")
    val out = Enrich.nppLegacyRename(df)
    assert(out.columns.toSet == Set("timestamp_ms", "plant"))
    assert(out.select("timestamp_ms").as[Long].head() == 1700000000000L)
  }

  test("chile legacy rename: plant_id → chile_plant_id; dropped columns") {
    val df = Seq(("5", "P", "CL", 1.0, 2.0)).toDF("plant_id", "plant", "country_code", "latitude", "longitude")
    val out = Enrich.chileLegacyRename(df)
    assert(out.columns.toSet == Set("chile_plant_id", "plant"))
  }

  test("timestamp coercion: epoch-ms passthrough, UTC string parse, garbage → null (database.py:633-665)") {
    val df = Seq("1700000000000", "2020-01-01 00:00:00", "garbage")
      .toDF("timestamp_ms")
    val out = Enrich.coerceTimestampMs(df).select("timestamp_ms")
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSeq
    assert(out == Seq(Some(1700000000000L), Some(1577836800000L), None))
  }

  test("ensureRunMetadata fills only absent values") {
    val df = Seq((Some("existing-id"), None: Option[Long]), (None, Some(5L)))
      .toDF("extraction_run_id", "created_at_ms")
    val out = Enrich.ensureRunMetadata(df, "new-id", 99L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out == Seq(("existing-id", 99L), ("new-id", 5L)))
  }

  test("defaultResolution only fills nulls") {
    val df = Seq(Some(30), None).toDF("resolution_minutes")
    val out = Enrich.defaultResolution(df, 60).as[Int].collect().toSeq
    assert(out == Seq(30, 60))
  }
}
