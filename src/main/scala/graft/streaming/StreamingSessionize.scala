package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Streaming gap-based sessionization on Spark's NATIVE
  * `session_window` — the event-time generalization of
  * [[graft.agg.Sessionize]] for unbounded clickstream/interaction
  * corpora, and the idiomatic Spark answer (no custom state code:
  * Catalyst's session-window state store handles merge/expiry, so the
  * operator inherits exactly-once, state TTL by watermark, and AQE-
  * free incremental planning for free).
  *
  * Boundary semantics — the one subtlety (and the whole reason this
  * wrapper exists): batch [[graft.agg.Sessionize.tagSessions]] is
  * boundary-INCLUSIVE (a new session opens only when the inter-event
  * gap EXCEEDS `gapUs`; events exactly `gapUs` apart share a
  * session), while `session_window(ts, gap)` extends a session to
  * `last_ts + gap` EXCLUSIVE (an event landing exactly on the session
  * end starts a new one). Passing `gapUs + 1` microseconds as the
  * native gap makes the two agree for every integer-micros timestamp:
  * merge iff `diff < gapUs + 1` iff `diff <= gapUs`. With that
  * adjustment the streamed sessions are BIT-IDENTICAL to the batch
  * operator's — StreamingSessionizeSpec replays a chunked fixture
  * (including an exactly-`gapUs` pair) and proves emitted ≡ batch.
  *
  * Output: one row per CLOSED session —
  * `(user, session_start, session_end, n_events, duration_us,
  * total_value)` — the [[graft.agg.Sessionize.sessionStats]] schema
  * minus `session_seq` (a per-user dense ordinal needs the user's
  * full history; on an unbounded stream it is undefined by
  * construction — renumber downstream per consumer window if needed).
  * `total_value` sums through DECIMAL(18,2) like the batch op, so the
  * emitted value is deterministic under any partitioning.
  *
  * Append-mode emission: a session is emitted once the watermark
  * passes its end + gap (no later event can merge into it). Lateness
  * beyond `watermarkDelay` is dropped by Spark — choose the delay as
  * the ingest's real out-of-orderness bound.
  *
  * Scale: state is per-OPEN-session (bounded by active users ×
  * session size), keyed by user — the same single user-keyed exchange
  * as the batch plan, but incremental: each micro-batch shuffles only
  * its own rows. The batch operator's hot-user hazard (one user's
  * whole history in one window sort) does not arise: the state store
  * merges per micro-batch, so a hot user costs per-batch work, never
  * a full-history sort.
  */
object StreamingSessionize {

  /** Per-session rollup over a stream; see object doc for semantics.
    * `stream` must be a streaming DataFrame; `tsCol` must be castable
    * to TIMESTAMP (the cast is an identity on micros under the UTC
    * session timezone graft pins). Null timestamps are excluded, as
    * in the batch operator's contract. */
  def sessionStats(
      stream: DataFrame,
      userCol: String,
      tsCol: String,
      valueCol: String,
      gapUs: Long,
      watermarkDelay: String = "1 hour",
  ): DataFrame = {
    require(gapUs >= 0, s"gapUs must be non-negative, got $gapUs")
    val evTime = graft.Defaults.freshCol(stream.columns.toIndexedSeq, "_event_time")
    val ts = col(tsCol).cast(TimestampType)
    stream
      .filter(col(tsCol).isNotNull)
      .withColumn(evTime, ts)
      .withWatermark(evTime, watermarkDelay)
      // +1 micro: native session_window is boundary-exclusive, batch
      // Sessionize boundary-inclusive — see object doc.
      .groupBy(col(userCol), session_window(col(evTime), s"${gapUs + 1} microseconds"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        (unix_micros(max(col(tsCol)).cast(TimestampType))
          - unix_micros(min(col(tsCol)).cast(TimestampType))).as("duration_us"),
        sum(col(valueCol).cast("decimal(18,2)")).cast("double").as("total_value"),
      )
      .select(col(userCol), col("session_start"), col("session_end"),
        col("n_events"), col("duration_us"), col("total_value"))
  }
}
