package graft.agg

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.schema.Schemas

/** Cross-source harmonization (SURVEY.md §2.6 note): the reference
  * unifies sources only by *stacking* per-source monthly aggregates by
  * column convention in the dashboard. The idiomatic Spark version is
  * an explicit `unionByName` view over the canonical envelope —
  * (source, extraction_run_id, timestamp_ms, resolution_minutes,
  * entity, fuel_type, generation_mwh) — with per-source column
  * mapping and MW→MWh normalization done once, here.
  *
  * The union is narrow (no shuffle): each source contributes a
  * projected scan, and Catalyst pushes any time filter down into
  * every branch.
  */
object Harmonize {

  /** Entity (plant-ish) column per source. */
  val entityColumn: Map[String, String] = Map(
    "npp" -> "plant_and_unit",
    "eia" -> "plant_code",
    "entsoe" -> "plant_name",
    "ons" -> "plant",
    "oe" -> "fueltech",
    "oe_facility" -> "facility_code",
    "occto" -> "plant",
    "chile" -> "plant",
  )

  /** Fuel-type column per source (NULL literal when absent). */
  val fuelColumn: Map[String, Option[String]] = Map(
    "npp" -> None,
    "eia" -> Some("fuel_source"),
    "entsoe" -> Some("fuel_type"),
    "ons" -> Some("fuel_type"),
    "oe" -> Some("fueltech"),
    "oe_facility" -> Some("fueltech"),
    "occto" -> Some("fuel_type"),
    "chile" -> Some("fuel_type"),
  )

  /** One source fact table → canonical envelope rows. */
  def envelopeOf(source: String, df: DataFrame): DataFrame = {
    val measure = Schemas.measureColumn(source)
    val mwh =
      if (source == "entsoe")
        Rollups.mwToMwh(col(measure), col("resolution_minutes"))
      else col(measure)
    df.select(
      lit(source).as("source"),
      col("extraction_run_id"),
      col("timestamp_ms"),
      col("resolution_minutes"),
      col(entityColumn(source)).cast("string").as("entity"),
      fuelColumn(source).map(c => col(c)).getOrElse(lit(null.asInstanceOf[String]))
        .cast("string").as("fuel_type"),
      mwh.cast("double").as("generation_mwh"),
    )
  }

  /** The harmonized all-sources view over a warehouse of fact tables;
    * missing tables are skipped (a source not yet loaded). */
  def harmonizedView(spark: SparkSession, warehouse: String): DataFrame = {
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val frames = Schemas.schemas.keys.toSeq.sorted.flatMap { source =>
      val path = graft.warehouse.Warehouse.tablePath(warehouse, source)
      if (fs.exists(new org.apache.hadoop.fs.Path(path)))
        Some(envelopeOf(source, spark.read.parquet(path)))
      else None
    }
    require(frames.nonEmpty, s"no fact tables found under $warehouse")
    frames.reduce(_.unionByName(_))
  }
}
