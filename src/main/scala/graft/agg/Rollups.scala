package graft.agg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Monthly rollup aggregations (reference operators A1–A5, the
  * materialized-view bodies in schema/materialized_views.sql and the
  * CSV-export aggregation in src/database.py:812-908).
  *
  * All of these are single hash-aggregate queries:
  * `HashAggregateExec(partial) → Exchange(group keys) →
  * HashAggregateExec(final)` — map-side combine means the shuffle
  * carries one row per (group × task), not per input row, which is why
  * the same plan holds at 100 TB: shuffle volume is bounded by group
  * cardinality (months × plants), not data size.
  */
object Rollups {

  /** Month bucket as 'YYYY-MM-01' (reference database.py:832
    * `TO_CHAR(date_trunc('month',…),'YYYY-MM-01')`). String-typed on
    * purpose: stable across engines and matches the reference export. */
  def monthStr(ts: Column): Column =
    date_format(date_trunc("month", ts), "yyyy-MM-01")

  /** Epoch-ms → timestamp (reference `TO_TIMESTAMP(ms/1000)`,
    * materialized_views.sql:25). */
  def msToTs(ms: Column): Column = timestamp_millis(ms)

  /** A1: MW→MWh monthly rollup — the unit conversion sits *inside* the
    * aggregate: `SUM(generation_mw * COALESCE(resolution_minutes,60)/60)`
    * (reference materialized_views.sql:23-33, mv_entsoe_monthly). */
  def mwToMwh(mw: Column, resolutionMinutes: Column, defaultRes: Int = 60): Column =
    mw * coalesce(resolutionMinutes, lit(defaultRes)) / 60.0

  /** A1–A3: generic monthly rollup. `dims` are the extra dimensions
    * (fuel_type for A1; plant/country/state for A2; none or fuel for
    * A3). `measure` is either raw MWh or [[mwToMwh]]. */
  def monthly(df: DataFrame, ts: Column, dims: Seq[(String, Column)], measure: Column): DataFrame = {
    val groups = ("month" -> monthStr(ts)) +: dims
    df.groupBy(groups.map { case (n, c) => c.as(n) }: _*)
      .agg(sum(measure).as("total_generation_mwh"))
  }

  /** A4: row-count coverage matrix — `COUNT(*)` per month per source
    * (reference schema/row_count_views.sql:17-104), stacked across
    * sources with a literal source tag, the union-by-convention the
    * reference dashboard applies. ~90 output rows per source: the
    * shuffle is negligible regardless of input size. */
  def coverageMatrix(tables: Seq[(String, DataFrame, Column)]): DataFrame =
    tables
      .map { case (source, df, ts) =>
        df.groupBy(monthStr(ts).as("month"))
          .agg(count(lit(1)).as("row_count"))
          .select(lit(source).as("source"), col("month"), col("row_count"))
      }
      .reduce(_.unionByName(_))

  /** A5: multi-metric monthly export —
    * `SUM(...) AS total_generation_mwh, COUNT(*) AS hours_of_data,
    * AVG(...) AS avg_generation_mw, MAX(...) AS peak_generation_mw`
    * at a parameterized granularity (reference database.py:829-891). */
  def multiMetricMonthly(
      df: DataFrame,
      ts: Column,
      dims: Seq[(String, Column)],
      measure: Column,
  ): DataFrame = {
    val groups = ("month" -> monthStr(ts)) +: dims
    df.groupBy(groups.map { case (n, c) => c.as(n) }: _*)
      .agg(
        sum(measure).as("total_generation_mwh"),
        count(lit(1)).as("hours_of_data"),
        avg(measure).as("avg_generation_mw"),
        max(measure).as("peak_generation_mw"),
      )
  }
}
