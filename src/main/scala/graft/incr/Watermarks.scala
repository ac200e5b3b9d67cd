package graft.incr

import java.time.LocalDate
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental-extraction windowing (reference operators I1–I4,
  * src/incremental_extract.py). High-watermark resume: next window
  * starts at `latest_date_in_table + 1 day`, clamped to a per-source
  * minimum start (incremental_extract.py:34-43, :62-68), optionally
  * overridden by an explicit window (I2), then chunked into month
  * windows with day-clamping (I3, :54-59).
  *
  * In Spark-world the watermark probe is a `max(to_date(ts))` aggregate
  * (see [[graft.agg.Stats.latestDates]]) and the month windows become
  * partition-pruned incremental loads.
  */
object Watermarks {

  /** Per-source minimum start dates (reference
    * incremental_extract.py:34-43). */
  val MinStartDates: Map[String, LocalDate] = Map(
    "entsoe" -> LocalDate.parse("2019-01-01"),
    "occto" -> LocalDate.parse("2024-01-01"),
  )

  /** I1: resume point = watermark + 1 day, clamped to minStart. */
  def resumeFrom(latest: Option[LocalDate], minStart: LocalDate): LocalDate =
    latest.map(_.plusDays(1)) match {
      case Some(d) if d.isAfter(minStart) => d
      case _ => minStart
    }

  /** Column form of I1 for in-plan use:
    * GREATEST(max_date + 1, minStart). */
  def resumeFromCol(latestDate: Column, minStart: String): Column =
    greatest(date_add(latestDate, 1), to_date(lit(minStart)))

  /** I2: override-window resolution — empty strings fall through to
    * the computed value (reference incremental_extract.py:71-81). */
  private val DateRe = "^\\d{4}-\\d{2}-\\d{2}$".r

  def resolveOverride(value: Option[String], fallback: LocalDate): LocalDate =
    value.map(_.trim).filter(_.nonEmpty) match {
      case None => fallback
      case Some(s) if DateRe.matches(s) => LocalDate.parse(s)
      case Some(s) =>
        throw new IllegalArgumentException(s"invalid date override: '$s' (want YYYY-MM-DD)")
    }

  /** I3: month windows [start-of-month chunks] covering [start, end],
    * with day-clamped month addition (reference
    * incremental_extract.py:54-59, :125-161). */
  def monthWindows(start: LocalDate, end: LocalDate): Seq[(LocalDate, LocalDate)] = {
    Iterator
      .iterate(start)(d => d.plusMonths(1))
      .takeWhile(!_.isAfter(end))
      .map { s =>
        val next = s.plusMonths(1)
        val e = if (next.isAfter(end)) end else next.minusDays(1)
        (s, e)
      }
      .toSeq
  }

  /** I4: long-window warning threshold (reference
    * incremental_extract.py:84-99). */
  val SoftWindowCapMonths = 12

  def windowTooLong(start: LocalDate, end: LocalDate): Boolean =
    start.plusMonths(SoftWindowCapMonths).isBefore(end)

  /** Month-window frame for in-plan use: one row per month start
    * between the min and max of `ts` (the partition-pruning driver for
    * incremental loads). */
  def monthWindowFrame(df: DataFrame, ts: Column): DataFrame =
    df.agg(
        date_trunc("month", min(ts)).as("lo"),
        date_trunc("month", max(ts)).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"), expr("interval 1 month"))).as("month_start"))
      .select(to_date(col("month_start")).as("month_start"))
}
