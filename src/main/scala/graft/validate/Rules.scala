package graft.validate

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Validation predicates (reference operators P9–P16) as pure `Column`
  * combinators — the codegen-friendly replacement for the reference's
  * per-record Python checks (src/validator.py:294-387). No UDFs: every
  * rule compiles into Catalyst expressions inside whole-stage codegen,
  * so a 100 TB validation pass stays a narrow, pipelined scan.
  */
object Rules {

  /** P11: canonical 8-4-4-4-12 UUID (reference validator.py:19-21). */
  val UuidRegex =
    "^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"

  def isUuid(c: Column): Column = c.rlike(UuidRegex)

  /** P12: positive epoch-ms, at most 24 h in the future (reference
    * validator.py:83-85, :300-310). `nowMs` is a frozen job parameter,
    * not wall-clock, for deterministic re-runs (SURVEY.md §7.3). */
  val MaxFutureBufferMs: Long = 24L * 60 * 60 * 1000

  def isPositiveTimestamp(c: Column, nowMs: Long): Column =
    c.isNotNull && c > 0L && c <= lit(nowMs + MaxFutureBufferMs)

  /** P13: non-empty after trim (reference validator.py:312-314). */
  def isNonEmptyString(c: Column): Column =
    c.isNotNull && trim(c) =!= ""

  /** P14: 50 states + DC + 5 territories, case-insensitive (reference
    * validator.py:24-81). Public USPS two-letter code list. */
  val UsStateCodes: Seq[String] = Seq(
    "AL", "AK", "AZ", "AR", "CA", "CO", "CT", "DE", "FL", "GA",
    "HI", "ID", "IL", "IN", "IA", "KS", "KY", "LA", "ME", "MD",
    "MA", "MI", "MN", "MS", "MO", "MT", "NE", "NV", "NH", "NJ",
    "NM", "NY", "NC", "ND", "OH", "OK", "OR", "PA", "RI", "SC",
    "SD", "TN", "TX", "UT", "VT", "VA", "WA", "WV", "WI", "WY",
    "DC", "AS", "GU", "MP", "PR", "VI",
  )

  def isUsStateCode(c: Column): Column =
    c.isNotNull && upper(c).isin(UsStateCodes: _*)

  /** P15: non-negative number (reference validator.py:320-324). */
  def isNonNegative(c: Column): Column = c.isNotNull && c >= 0

  /** P16: strictly positive number (reference validator.py:381-387). */
  def isPositive(c: Column): Column = c.isNotNull && c > 0

  // ---------------------------------------------------------------------
  // Rule = named predicate over a row; violation yields the error label.
  // Error label convention follows the reference: the text before the
  // first ':' is the error *type* used for stats (validator.py:496-505).
  // ---------------------------------------------------------------------

  final case class Rule(label: String, violated: Column)

  /** P9: required field must be present (non-null under schema-on-read,
    * where an absent JSON field reads as null — reference
    * validator.py:396-399). */
  def required(name: String): Rule =
    Rule(s"missing required field: $name", col(name).isNull)

  /** A required field with a validation predicate: null counts as
    * missing, non-null failing the predicate counts as invalid —
    * mirrors the reference's two-step check (validator.py:396-414). */
  def requiredWith(name: String, pred: Column => Column, errText: String): Seq[Rule] =
    Seq(
      required(name),
      Rule(s"$name: $errText", col(name).isNotNull && !pred(col(name))),
    )

  /** Optional field: checked only when present (validator.py:417-423). */
  def optionalWith(name: String, pred: Column => Column, errText: String): Rule =
    Rule(s"$name: $errText", col(name).isNotNull && !pred(col(name)))

  /** Envelope rules shared by every source (reference validator.py
    * schema tables :123-276: extraction_run_id uuid, created_at_ms +
    * timestamp_ms positive non-future). */
  def envelopeRules(nowMs: Long): Seq[Rule] =
    requiredWith("extraction_run_id", isUuid, "invalid UUID format") ++
      requiredWith("created_at_ms", isPositiveTimestamp(_, nowMs),
        "invalid timestamp (must be positive and not in future)") ++
      requiredWith("timestamp_ms", isPositiveTimestamp(_, nowMs),
        "invalid timestamp (must be positive and not in future)")
}
