package graft.schema

import org.apache.spark.sql.types._

/** Declared input schemas for the eight power-generation sources.
  *
  * The reference declares each source twice: SQL DDL (reference
  * per-source schema .sql files) and Python validator schemas (reference
  * src/validator.py:123-276). Here both collapse into one `StructType`
  * per source, used to enforce schema-on-read for JSONL ingestion
  * (never inferred — mirrors the reference's fixed-schema design).
  *
  * Shared harmonized envelope on every fact row (reference
  * README.md:225-236): extraction_run_id, created_at_ms, timestamp_ms,
  * resolution_minutes, plus one generation measure.
  */
object Schemas {

  /** Envelope fields shared by all sources. Epoch-millis longs for all
    * event time (reference schema/entsoe_generation.sql:31). */
  val envelope: Seq[StructField] = Seq(
    StructField("extraction_run_id", StringType),
    StructField("created_at_ms", LongType),
    StructField("timestamp_ms", LongType),
    StructField("resolution_minutes", IntegerType),
  )

  private def st(fields: StructField*): StructType =
    StructType(envelope ++ fields)

  /** reference src/validator.py:123-137 + schema/npp_generation.sql */
  val npp: StructType = st(
    StructField("plant", StringType),
    StructField("plant_and_unit", StringType),
    StructField("unit", StringType),
    StructField("generation_mwh", DoubleType),
  )

  /** reference src/validator.py:139-159 + schema/eia_generation.sql */
  val eia: StructType = st(
    StructField("utility_id", StringType),
    StructField("plant_code", StringType),
    StructField("generator_id", StringType),
    StructField("state", StringType),
    StructField("prime_mover", StringType),
    StructField("fuel_source", StringType),
    StructField("energy_source", StringType),
    StructField("net_generation_mwh", DoubleType),
    StructField("in_gcpt_crosswalk", BooleanType),
    StructField("eia_plant_unit_id", StringType),
  )

  /** reference src/validator.py:161-176 + schema/entsoe_generation.sql */
  val entsoe: StructType = st(
    StructField("country_code", StringType),
    StructField("psr_type", StringType),
    StructField("plant_name", StringType),
    StructField("fuel_type", StringType),
    StructField("data_type", StringType),
    StructField("generation_mw", DoubleType),
  )

  /** reference src/validator.py:178-199 + schema/ons_generation.sql */
  val ons: StructType = st(
    StructField("plant", StringType),
    StructField("ons_plant_id", StringType),
    StructField("plant_type", StringType),
    StructField("fuel_type", StringType),
    StructField("subsystem_id", StringType),
    StructField("subsystem", StringType),
    StructField("state", StringType),
    StructField("state_name", StringType),
    StructField("operation_mode", StringType),
    StructField("ceg", StringType),
    StructField("generation_mwh", DoubleType),
  )

  /** reference src/validator.py:201-216 + schema/oe_generation.sql */
  val oe: StructType = st(
    StructField("network_code", StringType),
    StructField("network_region", StringType),
    StructField("fueltech", StringType),
    StructField("fueltech_group", StringType),
    StructField("generation_mwh", DoubleType),
  )

  /** reference src/validator.py:238-258 + schema/oe_facility_generation.sql */
  val oeFacility: StructType = st(
    StructField("network_code", StringType),
    StructField("network_region", StringType),
    StructField("facility_code", StringType),
    StructField("facility_name", StringType),
    StructField("fueltech", StringType),
    StructField("fueltech_group", StringType),
    StructField("latitude", DoubleType),
    StructField("longitude", DoubleType),
    StructField("capacity_registered_mw", DoubleType),
    StructField("generation_mwh", DoubleType),
  )

  /** reference src/validator.py:218-236 + schema/occto_generation.sql */
  val occto: StructType = st(
    StructField("plant", StringType),
    StructField("unit", StringType),
    StructField("plant_code", StringType),
    StructField("fuel_code", StringType),
    StructField("fuel_type", StringType),
    StructField("area_code", StringType),
    StructField("area_name", StringType),
    StructField("generation_mwh", DoubleType),
  )

  /** reference src/validator.py:260-276 + schema/chile_generation.sql */
  val chile: StructType = st(
    StructField("plant", StringType),
    StructField("chile_plant_id", StringType),
    StructField("fuel_type", StringType),
    StructField("region", StringType),
    StructField("comuna", StringType),
    StructField("generation_mwh", DoubleType),
  )

  /** Natural dedup/upsert key per source (reference validator.py:136,
    * 158, 175, 198, 215, 235, 257, 275; UNIQUE indexes in per-source schema .sql files).
    * Keys marked in [[nullSafeKeyParts]] are COALESCE(col,'') in the
    * reference's expression indexes (ons_generation.sql:49-50 etc.). */
  val naturalKeys: Map[String, Seq[String]] = Map(
    "npp" -> Seq("timestamp_ms", "plant_and_unit"),
    "eia" -> Seq("timestamp_ms", "plant_code", "generator_id"),
    "entsoe" -> Seq("timestamp_ms", "country_code", "psr_type", "plant_name"),
    "ons" -> Seq("timestamp_ms", "plant", "ons_plant_id"),
    "oe" -> Seq("timestamp_ms", "fueltech", "network_code"),
    "oe_facility" -> Seq("timestamp_ms", "facility_code", "fueltech"),
    "occto" -> Seq("timestamp_ms", "plant", "unit"),
    "chile" -> Seq("timestamp_ms", "plant", "chile_plant_id"),
  )

  /** Key columns that are nullable and keyed as COALESCE(col, '') in the
    * reference (ons_generation.sql:49-50, occto_generation.sql:43-44,
    * chile_generation.sql:43-44). */
  val nullSafeKeyParts: Map[String, Set[String]] = Map(
    "ons" -> Set("ons_plant_id"),
    "occto" -> Set("unit"),
    "chile" -> Set("chile_plant_id"),
  ).withDefaultValue(Set.empty)

  /** Default resolution_minutes per source when the field is absent
    * (reference ons_generation.sql:31, occto_generation.sql:27,
    * oe_generation.sql:23, npp_generation.sql). EIA is monthly →
    * resolution stays NULL (eia_generation.sql). */
  val defaultResolutionMinutes: Map[String, Int] = Map(
    "npp" -> 1440,
    "ons" -> 60,
    "oe" -> 1440,
    "oe_facility" -> 1440,
    "occto" -> 30,
    "chile" -> 60,
    "entsoe" -> 60,
  )

  val schemas: Map[String, StructType] = Map(
    "npp" -> npp,
    "eia" -> eia,
    "entsoe" -> entsoe,
    "ons" -> ons,
    "oe" -> oe,
    "oe_facility" -> oeFacility,
    "occto" -> occto,
    "chile" -> chile,
  )

  // -------------------------------------------------------------------
  // Reference/metadata tables (not fact sources: no envelope, no
  // natural-key upsert — they are slowly-changing dimension tables the
  // capacity-enrichment joins broadcast).
  // -------------------------------------------------------------------

  /** EIA Form 860 generator-level reference data (reference
    * schema/eia_generator_info.sql:4-12): technology / prime mover /
    * nameplate capacity per (plant_code, generator_id). */
  val eiaGeneratorInfo: StructType = StructType(Seq(
    StructField("plant_code", StringType, nullable = false),
    StructField("generator_id", StringType, nullable = false),
    StructField("technology", StringType, nullable = false),
    StructField("prime_mover", StringType),
    StructField("energy_source_1", StringType),
    StructField("nameplate_capacity_mw", DoubleType),
  ))

  /** Global Coal Plant Tracker coal metadata (reference
    * schema/gcpt_coal_metadata.sql:4-14), keyed by gcpt_unit_id with a
    * unique-when-present eia_unit_id used to link EIA facts. */
  val gcptCoalMetadata: StructType = StructType(Seq(
    StructField("gcpt_unit_id", StringType, nullable = false),
    StructField("eia_unit_id", StringType),
    StructField("plant_name", StringType),
    StructField("unit_name", StringType),
    StructField("coal_type", StringType),
    StructField("technology", StringType),
    StructField("capacity_mw", DoubleType),
    StructField("country", StringType),
  ))

  /** Non-fact tables by their exact reference table name (reference
    * database.py:120-136 _KNOWN_TABLES beyond the 8 sources +
    * extraction_metadata, which IngestJob models as run metadata). */
  val referenceTables: Map[String, StructType] = Map(
    "eia_generator_info" -> eiaGeneratorInfo,
    "gcpt_coal_metadata" -> gcptCoalMetadata,
  )

  /** Measure column per source (MW for ENTSOE, net MWh for EIA, MWh
    * elsewhere — reference per-source schema .sql files). */
  val measureColumn: Map[String, String] =
    schemas.map { case (s, _) =>
      s -> (s match {
        case "entsoe" => "generation_mw"
        case "eia" => "net_generation_mwh"
        case _ => "generation_mwh"
      })
    }

  /** P10: lexical JSON type tag per field, transcribed from the
    * reference's validator schema tables (validator.py:123-276 `type`
    * entries). Enforced by [[graft.validate.Rules.typeRule]] over the
    * raw-line VARIANT, because schema-on-read erases token types.
    *
    * Documented deviation: entsoe `timestamp_ms` is `int_or_str` here
    * (reference: `int`) because the load path legally receives legacy
    * datetime *strings* that P5 coerces before insert (reference
    * database.py:633-665); a lexical `int` rule on the raw token would
    * reject records the reference's load path accepts. */
  val lexicalTypes: Map[String, Seq[(String, String)]] = {
    val env = Seq(
      "extraction_run_id" -> "str",
      "created_at_ms" -> "int",
      "timestamp_ms" -> "int")
    Map(
      "npp" -> (env ++ Seq(
        "plant" -> "str", "plant_and_unit" -> "str",
        "generation_mwh" -> "float", "unit" -> "str_or_null_or_number",
        "resolution_minutes" -> "int_or_null")),
      "eia" -> (env ++ Seq(
        "utility_id" -> "int_or_str", "plant_code" -> "int_or_str",
        "generator_id" -> "int_or_str", "state" -> "str",
        "prime_mover" -> "str", "net_generation_mwh" -> "float",
        "fuel_source" -> "str_or_null", "energy_source" -> "str_or_null",
        "resolution_minutes" -> "int_or_null",
        "in_gcpt_crosswalk" -> "bool_or_null",
        "eia_plant_unit_id" -> "str_or_null")),
      "entsoe" -> (Seq(
        "extraction_run_id" -> "str",
        "created_at_ms" -> "int",
        "timestamp_ms" -> "int_or_str") ++ Seq( // deviation, see above
        "country_code" -> "str", "psr_type" -> "str",
        "plant_name" -> "str", "fuel_type" -> "str", "data_type" -> "str",
        "generation_mw" -> "float", "resolution_minutes" -> "int")),
      "ons" -> (env ++ Seq(
        "plant" -> "str", "generation_mwh" -> "float") ++
        Seq("ons_plant_id", "plant_type", "fuel_type", "subsystem_id",
          "subsystem", "state", "state_name", "operation_mode", "ceg")
          .map(_ -> "str_or_null") ++
        Seq("resolution_minutes" -> "int_or_null")),
      "oe" -> (env ++ Seq(
        "network_code" -> "str", "fueltech" -> "str",
        "generation_mwh" -> "float",
        "network_region" -> "str_or_null", "fueltech_group" -> "str_or_null",
        "resolution_minutes" -> "int_or_null")),
      "oe_facility" -> (env ++ Seq(
        "network_code" -> "str", "facility_code" -> "str",
        "facility_name" -> "str", "fueltech" -> "str",
        "generation_mwh" -> "float",
        "network_region" -> "str_or_null", "fueltech_group" -> "str_or_null",
        "latitude" -> "float_or_null", "longitude" -> "float_or_null",
        "capacity_registered_mw" -> "float_or_null",
        "resolution_minutes" -> "int_or_null")),
      "occto" -> (env ++ Seq(
        "plant" -> "str", "generation_mwh" -> "float") ++
        Seq("unit", "plant_code", "fuel_code", "fuel_type",
          "area_code", "area_name").map(_ -> "str_or_null") ++
        Seq("resolution_minutes" -> "int_or_null")),
      "chile" -> (env ++ Seq(
        "plant" -> "str", "generation_mwh" -> "float") ++
        Seq("chile_plant_id", "fuel_type", "region", "comuna")
          .map(_ -> "str_or_null") ++
        Seq("resolution_minutes" -> "int_or_null")),
    )
  }

  /** Read-side schemas: the table schema plus legacy input fields the
    * enrichment renames away (reference database.py:493-499 NPP
    * `date`/`scrape_id`; :1629-1660 Chile `plant_id` + dropped geo
    * columns). Ingestion reads with these so legacy-shaped records
    * survive schema-on-read. */
  val readSchemas: Map[String, StructType] = schemas.map {
    case ("npp", st) =>
      "npp" -> st.add("date", LongType).add("scrape_id", StringType)
    case ("chile", st) =>
      "chile" -> st.add("plant_id", StringType).add("country_code", StringType)
        .add("latitude", DoubleType).add("longitude", DoubleType)
    case ("entsoe", st) =>
      // timestamp_ms may arrive as a datetime *string* (reference
      // database.py:633-665) — read as string, coerce in P5.
      "entsoe" -> StructType(st.fields.map(f =>
        if (f.name == "timestamp_ms") f.copy(dataType = StringType) else f))
    case (s, st) => s -> st
  }
}
