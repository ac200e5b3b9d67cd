package graft.agg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table statistics / probe aggregations (reference operators A6–A11).
  * All are tiny-output global or near-global aggregates — partial
  * aggregation makes each a single cheap pass regardless of table size.
  */
object Stats {

  /** A6: distinct years present (reference database.py:864-872) —
    * drives the per-year export loop / partitioned write. */
  def distinctYears(df: DataFrame, ts: Column): DataFrame =
    df.select(year(ts).as("year")).distinct().orderBy(col("year"))

  /** A7: per-run date range — min/max day for one extraction run
    * (reference database.py:1539-1563). */
  def dateRange(df: DataFrame, ts: Column, runFilter: Column): DataFrame =
    df.filter(runFilter)
      .agg(
        date_format(min(ts), "yyyy-MM-dd").as("start_date"),
        date_format(max(ts), "yyyy-MM-dd").as("end_date"),
      )

  /** A8: latest data date per source, with the reference's epoch
    * fallback for empty tables (reference get_latest_date.py:19-33) —
    * the incremental-resume watermark probe. */
  def latestDates(tables: Seq[(String, DataFrame, Column)]): DataFrame =
    tables
      .map { case (source, df, ts) =>
        df.agg(
          coalesce(max(to_date(ts)), to_date(lit("1970-01-01")))
            .as("latest_date"))
          .select(lit(source).as("source"), col("latest_date"))
      }
      .reduce(_.unionByName(_))

  /** A9: record counts across tables (reference database.py:1503-1537,
    * database_management.py:184-202). */
  def recordCounts(tables: Seq[(String, DataFrame)]): DataFrame =
    tables
      .map { case (name, df) =>
        df.agg(count(lit(1)).as("record_count"))
          .select(lit(name).as("table_name"), col("record_count"))
      }
      .reduce(_.unionByName(_))

  /** A10: conditional-aggregation summary, the `extraction_summary`
    * view — `COUNT(*) FILTER (WHERE success)`, totals, date bounds per
    * source (reference schema/extraction_metadata.sql:68-81). */
  def conditionalSummary(
      df: DataFrame,
      groupCol: Column,
      successCond: Column,
      totalCol: Column,
      startCol: Column,
      endCol: Column,
  ): DataFrame =
    df.groupBy(groupCol.as("source"))
      .agg(
        count(lit(1)).as("total_runs"),
        sum(when(successCond, 1L).otherwise(0L)).as("successful_runs"),
        sum(totalCol).as("total_records"),
        min(startCol).as("earliest_start"),
        max(endCol).as("latest_end"),
      )
}
