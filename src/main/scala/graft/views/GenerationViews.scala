package graft.views

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.agg.Rollups

/** The concrete materialized-view registry, mirroring the reference's
  * source→views map (reference refresh_views.py:24-34) and the view
  * bodies in schema/materialized_views.sql + row_count_views.sql:
  * per-source monthly rollups (+plant variants) and per-source
  * row-count coverage views. EIA/OE carry row-count views only — their
  * raw tables are small enough to read directly
  * (refresh_views.py:28-29).
  *
  * Each view is a pre-aggregated parquet table refreshed by
  * [[Refresh.refreshView]] (atomic swap = REFRESH … CONCURRENTLY):
  * the dashboard reads hundreds of rows instead of scanning the fact
  * tables (materialized_views.sql:2-3) — at 100 TB this is the only
  * sane read path.
  */
object GenerationViews {

  /** Source table location inside a warehouse of per-source parquet
    * fact tables. */
  def factPath(warehouse: String, source: String): String =
    s"${warehouse.stripSuffix("/")}/${source}_generation_data"

  private def fact(warehouse: String, source: String)(s: SparkSession): DataFrame =
    s.read.parquet(factPath(warehouse, source))

  private def ts = Rollups.msToTs(col("timestamp_ms"))

  /** mv_<source>_monthly: SUM(measure) by month × fuel (A1/A3). ENTSOE
    * converts MW→MWh inside the aggregate (materialized_views.sql:27). */
  private def monthly(warehouse: String, source: String, fuelDim: Option[String]): Refresh.ViewJob =
    Refresh.ViewJob(s"mv_${source}_monthly", s => {
      val df = fact(warehouse, source)(s)
      val measure =
        if (source == "entsoe")
          Rollups.mwToMwh(col("generation_mw"), col("resolution_minutes"))
        else col("generation_mwh")
      Rollups.monthly(df, ts, fuelDim.toSeq.map(d => d -> col(d)), measure)
    })

  /** mv_<source>_plant_monthly (A2). */
  private def plantMonthly(warehouse: String, source: String, dims: Seq[String]): Refresh.ViewJob =
    Refresh.ViewJob(s"mv_${source}_plant_monthly", s => {
      val df = fact(warehouse, source)(s)
      val measure =
        if (source == "entsoe")
          Rollups.mwToMwh(col("generation_mw"), col("resolution_minutes"))
        else col("generation_mwh")
      Rollups.monthly(df, ts, dims.map(d => d -> col(d)), measure)
    })

  /** mv_<source>_row_counts (A4): COUNT(*) by month
    * (row_count_views.sql:17-104). */
  private def rowCounts(warehouse: String, source: String): Refresh.ViewJob =
    Refresh.ViewJob(s"mv_${source}_row_counts", s =>
      fact(warehouse, source)(s)
        .groupBy(Rollups.monthStr(ts).as("month"))
        .agg(count(lit(1)).as("row_count")))

  /** The registry (reference refresh_views.py:24-34). */
  def registry(warehouse: String): Refresh.Registry = Refresh.Registry(Map(
    "entsoe" -> Seq(
      monthly(warehouse, "entsoe", Some("fuel_type")),
      plantMonthly(warehouse, "entsoe", Seq("plant_name", "country_code", "fuel_type")),
      rowCounts(warehouse, "entsoe")),
    "ons" -> Seq(
      monthly(warehouse, "ons", Some("fuel_type")),
      plantMonthly(warehouse, "ons", Seq("plant", "state", "fuel_type")),
      rowCounts(warehouse, "ons")),
    "npp" -> Seq(
      monthly(warehouse, "npp", None),
      plantMonthly(warehouse, "npp", Seq("plant")),
      rowCounts(warehouse, "npp")),
    "occto" -> Seq(
      monthly(warehouse, "occto", Some("fuel_type")),
      plantMonthly(warehouse, "occto", Seq("plant", "area_name", "fuel_type")),
      rowCounts(warehouse, "occto")),
    "chile" -> Seq(
      monthly(warehouse, "chile", Some("fuel_type")),
      plantMonthly(warehouse, "chile", Seq("plant", "region", "fuel_type")),
      rowCounts(warehouse, "chile")),
    // EIA / OE: row-count views only (raw tables read directly)
    "eia" -> Seq(rowCounts(warehouse, "eia")),
    "oe" -> Seq(rowCounts(warehouse, "oe")),
    "oe_facility" -> Seq(rowCounts(warehouse, "oe_facility")),
  ))
}
