package graft.agg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization — the canonical event-stream rollup
  * (Kleppmann, "Designing Data-Intensive Applications" §10; the same
  * semantics as Spark's streaming `session_window`, expressed for
  * batch): consecutive events of one user belong to the same session
  * while the inter-event gap stays within `gapUs`; a larger gap opens
  * a new session.
  *
  * Scale design:
  *   - ONE shuffle, on the user key: both the gap flag (lag) and the
  *     running session counter are windows over the SAME
  *     (user, ts-ordered) partitioning, so Catalyst plans a single
  *     exchange + sort and evaluates both window functions in one
  *     pass. The subsequent per-session aggregate reuses the
  *     (user)-hash partitioning — no second exchange of the fact rows.
  *   - No global ordering anywhere: session numbering is per-user
  *     (user_id, session_seq), exactly what a 1000-executor run needs
  *     — a globally-dense session id would serialize on a single
  *     partition.
  *   - Skew: a single hot user serializes that user's window sort —
  *     inherent to the semantics (sessions are a per-user total
  *     order). The mitigation at 100 TB is time-bucketed pre-split
  *     (sessionize within (user, day), then merge boundary sessions),
  *     which [[sessionStats]] callers can layer on; for telemetry-shaped
  *     corpora (bounded events/user/day) the plain form is the right
  *     default.
  *   - Money/measure sums quantize to DECIMAL(18,2) (exact,
  *     order-free) before aggregation, so results are deterministic
  *     under any partitioning and SQL-replayable.
  *
  * Reference analog: the reference pipeline rolls ENTSOE readings into
  * monthly windows (aggregate_and_export.py); sessions are the
  * event-time generalization a training-data pipeline needs for
  * clickstream/interaction corpora.
  */
object Sessionize {

  /** Tag each event with its (per-user) session sequence number.
    * `orderCols` breaks ts ties deterministically (pass the event id).
    * Emits the input columns plus `session_seq` (1-based, dense per
    * user). */
  def tagSessions(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      gapUs: Long,
      tieBreak: Seq[String] = Seq.empty,
  ): DataFrame = {
    val order: Seq[Column] = (tsCol +: tieBreak).map(col)
    val w = Window.partitionBy(col(userCol)).orderBy(order: _*)
    val us = unix_micros(col(tsCol))
    val prev = lag(us, 1).over(w)
    val isBreak = when(prev.isNull || us - prev > gapUs, lit(1)).otherwise(lit(0))
    events
      .withColumn("_brk", isBreak)
      .withColumn("session_seq",
        sum(col("_brk")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("_brk")
  }

  /** Per-session rollup: bounds, size, duration, exact value sum.
    * One user-keyed shuffle total (see scale notes above). */
  def sessionStats(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      valueCol: String,
      gapUs: Long,
      tieBreak: Seq[String] = Seq.empty,
  ): DataFrame =
    tagSessions(events, userCol, tsCol, gapUs, tieBreak)
      .groupBy(col(userCol), col("session_seq"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        (unix_micros(max(col(tsCol))) - unix_micros(min(col(tsCol))))
          .as("duration_us"),
        sum(col(valueCol).cast("decimal(18,2)")).cast("double").as("total_value"),
      )
}
