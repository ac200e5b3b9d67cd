package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Record enrichment / normalization transforms (reference operators
  * P1–P8) as pure DataFrame→DataFrame functions.
  *
  * Everything here is a narrow (shuffle-free) projection that stays
  * inside whole-stage codegen — the Spark-native replacement for the
  * reference's per-record Python loop (src/database.py:612-717).
  */
object Enrich {

  /** ENTSO-E PSR code → fuel-type name (public ENTSO-E "production and
    * generation type" code list; reference src/database.py:35-56). */
  val PsrToFuelType: Map[String, String] = Map(
    "B01" -> "Biomass",
    "B02" -> "Fossil Brown coal/Lignite",
    "B03" -> "Fossil Coal-derived gas",
    "B04" -> "Fossil Gas",
    "B05" -> "Fossil Hard coal",
    "B06" -> "Fossil Oil",
    "B07" -> "Fossil Oil shale",
    "B08" -> "Fossil Peat",
    "B09" -> "Geothermal",
    "B10" -> "Hydro Pumped Storage",
    "B11" -> "Hydro Run-of-river and poundage",
    "B12" -> "Hydro Water Reservoir",
    "B13" -> "Marine",
    "B14" -> "Nuclear",
    "B15" -> "Other renewable",
    "B16" -> "Solar",
    "B17" -> "Waste",
    "B18" -> "Wind Offshore",
    "B19" -> "Wind Onshore",
    "B20" -> "Other",
  )

  /** Suffixes that leak into ENTSOE plant names from column flattening
    * (reference src/database.py:58-60): data-type suffixes first, then
    * fuel-type suffixes longest-first, one strip from each family. */
  val DataTypeSuffixes: Seq[String] = Seq("Actual Aggregated", "Actual Consumption")
  val FuelTypeSuffixes: Seq[String] =
    PsrToFuelType.values.toSeq.sortBy(-_.length)

  /** P1: whitelist projection in declared order (reference
    * database.py:786, :1253-1268, :1589-1601). Catalyst column pruning
    * pushes this into the scan. */
  def project(df: DataFrame, columns: Seq[String]): DataFrame =
    df.select(columns.map(col): _*)

  /** P2: metadata enrichment — add extraction_run_id / created_at_ms
    * when absent (reference database.py:477-491 etc.). Both are frozen
    * job parameters (not uuid()/now() expressions) so re-runs and
    * oracle comparisons are deterministic (SURVEY.md §7.3). */
  def ensureRunMetadata(df: DataFrame, runId: String, nowMs: Long): DataFrame = {
    val withRun =
      if (df.columns.contains("extraction_run_id"))
        df.withColumn("extraction_run_id", coalesce(col("extraction_run_id"), lit(runId)))
      else df.withColumn("extraction_run_id", lit(runId))
    if (withRun.columns.contains("created_at_ms"))
      withRun.withColumn("created_at_ms", coalesce(col("created_at_ms"), lit(nowMs)))
    else withRun.withColumn("created_at_ms", lit(nowMs))
  }

  /** P3 (NPP): legacy `date` (unix seconds) → `timestamp_ms`, drop
    * `scrape_id` (reference database.py:493-499). The reference's
    * check is per *record* ("date" present, "timestamp_ms" absent), so
    * under schema-on-read this is a value-level coalesce — mixed-shape
    * files work. */
  def nppLegacyRename(df: DataFrame): DataFrame = {
    val renamed =
      if (!df.columns.contains("date")) df
      else if (df.columns.contains("timestamp_ms"))
        df.withColumn("timestamp_ms",
          coalesce(col("timestamp_ms"), col("date").cast(LongType) * 1000L)).drop("date")
      else df.withColumn("timestamp_ms", col("date").cast(LongType) * 1000L).drop("date")
    if (renamed.columns.contains("scrape_id")) renamed.drop("scrape_id") else renamed
  }

  /** P3 (Chile): legacy `plant_id` → `chile_plant_id` (value-level,
    * like NPP above); drop columns the DDL does not carry (reference
    * database.py:1629-1631, :1655-1660). */
  def chileLegacyRename(df: DataFrame): DataFrame = {
    val renamed =
      if (!df.columns.contains("plant_id")) df
      else if (df.columns.contains("chile_plant_id"))
        df.withColumn("chile_plant_id", coalesce(col("chile_plant_id"), col("plant_id")))
          .drop("plant_id")
      else df.withColumnRenamed("plant_id", "chile_plant_id")
    renamed.drop("country_code", "latitude", "longitude")
  }

  /** P4: numeric ids → string (reference database.py:975-983, EIA
    * utility_id/plant_code/generator_id). */
  def idsToString(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.filter(df.columns.contains).foldLeft(df) { (acc, c) =>
      acc.withColumn(c, col(c).cast("string"))
    }

  /** P5: timestamp coercion — `timestamp_ms` may arrive as epoch-ms
    * (number or numeric string) or as a datetime string; naive strings
    * are treated as UTC (reference database.py:633-665). Unparseable
    * or null timestamps yield NULL here; the caller filters them out
    * (the reference skips the record with a warning). */
  def coerceTimestampMs(c: Column): Column =
    when(c.cast(LongType).isNotNull, c.cast(LongType))
      .otherwise(unix_millis(c.cast(TimestampType)))

  def coerceTimestampMs(df: DataFrame, colName: String = "timestamp_ms"): DataFrame =
    df.withColumn(colName, coerceTimestampMs(col(colName)))

  /** P6: psr_type → fuel_type dictionary fix-up (reference
    * database.py:667-670): whenever psr_type is a known code, the fuel
    * name derived from it *overwrites* fuel_type (repairs records
    * extracted with fuel_type="Unknown"). A broadcast literal map, not
    * a join — 20 entries never justify a shuffle. */
  val psrFuelExpr: Column = {
    val m = typedLit(PsrToFuelType)
    coalesce(m(col("psr_type")), col("fuel_type"))
  }

  def fixFuelTypeFromPsr(df: DataFrame): DataFrame =
    df.withColumn("fuel_type", psrFuelExpr)

  /** P7: strip leaked `_<data type>` then `_<fuel name>` suffixes from
    * plant_name, longest-first, at most one from each family (reference
    * database.py:672-682). Pure `when` chain — codegen-friendly, no UDF. */
  def stripPlantSuffixes(c: Column): Column = {
    def strip(input: Column, suffix: String): Column =
      input.substr(lit(1), length(input) - lit(suffix.length + 1))
    def stripFamily(input: Column, suffixes: Seq[String]): Column = {
      val first = when(endswith(input, lit("_" + suffixes.head)), strip(input, suffixes.head))
      suffixes.tail
        .foldLeft(first) { (acc, s) =>
          acc.when(endswith(input, lit("_" + s)), strip(input, s))
        }
        .otherwise(input)
    }
    stripFamily(stripFamily(c, DataTypeSuffixes), FuelTypeSuffixes)
  }

  def stripPlantSuffixes(df: DataFrame, colName: String = "plant_name"): DataFrame =
    df.withColumn(colName, stripPlantSuffixes(col(colName)))

  /** P8: add missing optional columns as NULL of the declared type
    * (reference database.py:984-988). */
  def defaultMissing(df: DataFrame, cols: Map[String, String]): DataFrame =
    cols.foldLeft(df) { case (acc, (name, dt)) =>
      if (acc.columns.contains(name)) acc
      else acc.withColumn(name, lit(null).cast(dt))
    }

  /** Default resolution_minutes when absent/null (reference
    * ons_generation.sql:31 etc.). */
  def defaultResolution(df: DataFrame, minutes: Int): DataFrame =
    if (df.columns.contains("resolution_minutes"))
      df.withColumn("resolution_minutes",
        coalesce(col("resolution_minutes"), lit(minutes)))
    else df.withColumn("resolution_minutes", lit(minutes))
}
