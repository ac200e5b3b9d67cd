package graft.agg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Gap-based sessionization — the canonical event-stream rollup
  * (Kleppmann, "Designing Data-Intensive Applications" §10; a
  * `session_window`-style batch form — boundary-inclusive variant:
  * events exactly `gapUs` apart stay in one session, where streaming
  * `session_window` closes at >= gapDuration): consecutive events of
  * one user belong to the same session while the inter-event gap stays
  * within `gapUs`; a larger gap opens a new session.
  *
  * Null timestamps are excluded up front (engines disagree on null
  * ordering — Spark sorts NULLS FIRST ascending, most SQL engines
  * NULLS LAST — and a null gap can neither open nor extend a session
  * meaningfully). The filter is part of the operator's contract, kept
  * identical in the SQL oracle.
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
  *   - Skew: a single hot user serializes that user's window sort in
  *     the plain form — inherent to the semantics (sessions are a
  *     per-user total order). [[sessionStatsBucketed]] is the shipped
  *     mitigation: sessionize within (user, time bucket) — per-task
  *     input bounded by the bucket, not the user — then merge
  *     boundary-crossing sessions with one follow-up window over
  *     SESSION rows (orders of magnitude fewer than events). For
  *     telemetry-shaped corpora (bounded events/user/day) the plain
  *     form is the right default — and it OBSERVES the hazard: a
  *     dominant key fires a rate-limited SkewTelemetry WARN pointing
  *     at the bucketed variant (see [[sessionStats]]).
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

  /** Microsecond epoch of a timestamp column, robust to TIMESTAMP_NTZ
    * inputs (parquet micros with isAdjustedToUTC=false): unix_micros
    * rejects NTZ at analysis, and the cast is an identity on the
    * micros value under the UTC session timezone graft pins. */
  private def micros(c: Column): Column = unix_micros(c.cast(TimestampType))

  /** A working-column name guaranteed absent from `df` (an input that
    * already carries e.g. `_brk` must survive unclobbered). */
  private def fresh(df: DataFrame, base: String): String =
    graft.Defaults.freshCol(df.columns.toIndexedSeq, base)

  /** Tag each event with its (per-user) session sequence number.
    * `orderCols` breaks ts ties deterministically (pass the event id).
    * Rows with a null `tsCol` are dropped (see object doc). Emits the
    * input columns plus `session_seq` (1-based, dense per user). */
  def tagSessions(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      gapUs: Long,
      tieBreak: Seq[String] = Seq.empty,
  ): DataFrame = {
    val order: Seq[Column] = (tsCol +: tieBreak).map(col)
    val w = Window.partitionBy(col(userCol)).orderBy(order: _*)
    val us = micros(col(tsCol))
    val prev = lag(us, 1).over(w)
    val isBreak = when(prev.isNull || us - prev > gapUs, lit(1)).otherwise(lit(0))
    val brk = fresh(events, "_brk")
    events
      .filter(col(tsCol).isNotNull)
      .withColumn(brk, isBreak)
      .withColumn("session_seq",
        sum(col(brk)).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop(brk)
  }

  /** Per-session rollup: bounds, size, duration, exact value sum.
    * One user-keyed shuffle total (see scale notes above).
    *
    * Skew telemetry (no-silent-caps principle, the observing analog of
    * the LSH bucket gates): the documented hot-user hazard — one
    * dominant user serializing its window sort into a single task —
    * is OBSERVED on the result frame via `observe()` (zero extra jobs)
    * and surfaced through [[graft.quality.SkewTelemetry]]: when the
    * largest single session carries ≥ half of all events and the
    * corpus is big enough to care (`hotSessionMinEvents`), the
    * rate-limited WARN fires once per session and points at
    * [[sessionStatsBucketed]]. The largest session is a lower bound on
    * the largest user's event count, so a firing is always a true
    * positive for the hazard. */
  def sessionStats(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      valueCol: String,
      gapUs: Long,
      tieBreak: Seq[String] = Seq.empty,
      hotSessionMinEvents: Long = 1000000L,
  ): DataFrame = {
    graft.quality.SkewTelemetry.ensureRegistered(events.sparkSession)
    graft.quality.SkewTelemetry.registerAdvice("sessionize",
      "A dominant user key serializes the per-user window sort into one " +
        "task; use sessionStatsBucketed(bucketUs) to bound per-task input " +
        "by (user, time bucket) — bit-identical output, two bounded " +
        "exchanges; measured 2.69x faster (19.6 vs 7.3 s) on a 40M-row " +
        "corpus with a 12M-row hot user (MEASUREMENTS_R11.json).")
    val stats = tagSessions(events, userCol, tsCol, gapUs, tieBreak)
      .groupBy(col(userCol), col("session_seq"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        (micros(max(col(tsCol))) - micros(min(col(tsCol))))
          .as("duration_us"),
        sum(col(valueCol).cast("decimal(18,2)")).cast("double").as("total_value"),
      )
    stats.observe(
      graft.quality.SkewTelemetry.nextMetricName("sessionize"),
      when(max(col("n_events")) * 2 >= sum(col("n_events")) &&
        sum(col("n_events")) >= hotSessionMinEvents, 1L).otherwise(0L)
        .as("hot_groups"),
      coalesce(max(col("n_events")), lit(0L)).as("max_session_events"),
      lit(0L).as("skipped_pairs"))
  }

  /** [[sessionStats]] with the hot-user skew mitigation: identical
    * output (same schema, same rows) computed in two bounded stages.
    *
    * Stage 1 sessionizes within (user, time bucket of `bucketUs`
    * micros) and collapses each local session to ONE row — the
    * expensive window sort's partition is (user, bucket), so a
    * pathological user with 10^9 events spread over years never lands
    * in one task; per-task input is bounded by the user's densest
    * bucket.
    *
    * Stage 2 merges local sessions that cross bucket boundaries: a
    * per-user window over SESSION rows (already collapsed — tiny
    * relative to events) joins consecutive local sessions whose
    * boundary gap is within `gapUs`, renumbers them densely, and
    * re-aggregates the session stats. Sums stay DECIMAL through the
    * merge and cast to double only at the end, so bucketed ≡ plain
    * bit-for-bit.
    *
    * Equivalence argument: the bucket key floor(ts/bucketUs) is
    * monotone in ts, so the global per-user event order is the
    * concatenation of the per-bucket orders; every within-bucket gap
    * is adjudicated by stage 1 and every cross-bucket gap (= gap
    * between a local session's last event and the next local
    * session's first event) by stage 2. SessionizeSpec proves
    * bucketed ≡ plain on boundary-spanning fixtures.
    *
    * Choose `bucketUs` >= `gapUs` and large enough that session rows
    * per bucket stay small (e.g. a day for a 6 h gap). Correctness
    * holds for any positive `bucketUs`; a bucket smaller than the gap
    * just shifts more merging to stage 2. */
  def sessionStatsBucketed(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      valueCol: String,
      gapUs: Long,
      bucketUs: Long,
      tieBreak: Seq[String] = Seq.empty,
  ): DataFrame = {
    require(bucketUs > 0, s"bucketUs must be positive, got $bucketUs")
    val us = micros(col(tsCol))
    // Exact integer floor-to-bucket (pmod keeps negatives sane);
    // floating floor(us/bucket) would wobble near 2^53 micros.
    val bucketStart = us - pmod(us, lit(bucketUs))

    val bucket = fresh(events, "_bucket")
    val brk = fresh(events, "_brk")
    val lseq = fresh(events, "_lseq")

    // Stage 1: sessionize within (user, bucket); collapse to one row
    // per local session. The window partition is (user, bucket) — the
    // skew bound.
    val order: Seq[Column] = (tsCol +: tieBreak).map(col)
    val wLocal = Window.partitionBy(col(userCol), col(bucket)).orderBy(order: _*)
    val prev = lag(us, 1).over(wLocal)
    val isBreak = when(prev.isNull || us - prev > gapUs, lit(1)).otherwise(lit(0))
    val localStats = events
      .filter(col(tsCol).isNotNull)
      .withColumn(bucket, bucketStart)
      .withColumn(brk, isBreak)
      .withColumn(lseq,
        sum(col(brk)).over(wLocal.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(userCol), col(bucket), col(lseq))
      .agg(
        min(col(tsCol)).as("_start"),
        max(col(tsCol)).as("_end"),
        count(lit(1)).as("_n"),
        sum(col(valueCol).cast("decimal(18,2)")).as("_val"),
      )

    // Stage 2: merge boundary-crossing local sessions. Window over
    // session rows only; (bucket, lseq) is the deterministic per-user
    // order (monotone in start ts by construction).
    val wUser = Window.partitionBy(col(userCol)).orderBy(col(bucket), col(lseq))
    val prevEnd = lag(micros(col("_end")), 1).over(wUser)
    val mergeBreak = when(
      prevEnd.isNull || micros(col("_start")) - prevEnd > gapUs,
      lit(1)).otherwise(lit(0))
    val mbrk = fresh(localStats, "_mbrk")
    localStats
      .withColumn(mbrk, mergeBreak)
      .withColumn("session_seq",
        sum(col(mbrk)).over(wUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(userCol), col("session_seq"))
      .agg(
        min(col("_start")).as("session_start"),
        max(col("_end")).as("session_end"),
        sum(col("_n")).as("n_events"),
        (micros(max(col("_end"))) - micros(min(col("_start"))))
          .as("duration_us"),
        sum(col("_val")).cast("double").as("total_value"),
      )
  }
}
