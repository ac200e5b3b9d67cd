package graft.incr

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** I9: metadata date backfill (reference
  * backfill_extraction_dates.py:47-103): for metadata rows with NULL
  * start/end dates, recompute the range from the fact table by
  * extraction_run_id and rewrite the metadata table.
  *
  * One aggregation over the fact table grouped by run id (partial
  * aggregation ⇒ shuffle carries one row per run per task), one
  * broadcast-friendly join back onto the (tiny) metadata table.
  */
object Backfill {

  /** Per-run [start_date, end_date] derived from fact timestamps
    * (the grouped form of A7, reference database.py:1539-1563). */
  def runDateRanges(fact: DataFrame, runIdCol: Column, tsMsCol: Column): DataFrame =
    fact
      .groupBy(runIdCol.as("extraction_run_id"))
      .agg(
        date_format(timestamp_millis(min(tsMsCol)), "yyyy-MM-dd").as("_derived_start"),
        date_format(timestamp_millis(max(tsMsCol)), "yyyy-MM-dd").as("_derived_end"),
      )

  /** Fill NULL start_date/end_date in `metadata` from the fact table;
    * non-null values are left untouched (the reference only updates
    * rows WHERE start_date IS NULL). */
  def backfillDates(
      metadata: DataFrame,
      fact: DataFrame,
      runIdCol: String = "extraction_run_id",
      tsMsCol: String = "timestamp_ms",
      startCol: String = "start_date",
      endCol: String = "end_date",
  ): DataFrame = {
    val ranges = runDateRanges(fact, col(runIdCol), col(tsMsCol))
    metadata
      .join(broadcast(ranges), Seq(runIdCol), "left")
      .withColumn(startCol, coalesce(col(startCol), col("_derived_start")))
      .withColumn(endCol, coalesce(col(endCol), col("_derived_end")))
      .drop("_derived_start", "_derived_end")
  }
}
