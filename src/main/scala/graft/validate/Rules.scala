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
  // P10: lexical JSON type checks (reference validator.py:326-362).
  //
  // Spark's schema-on-read erases the raw JSON token type (a bool in an
  // int field reads as null; a quoted "100.0" coerces to double), so
  // the reference's lexical rules — bool is NOT an int/float, int IS a
  // float, int_or_str, str_or_null_or_number — are recovered from the
  // raw line parsed as a VARIANT (Spark 4 `parse_json`):
  // `schema_of_variant(variant_get(v, '$.field'))` yields the exact
  // JSON token type (BOOLEAN / BIGINT / DECIMAL(p,s) / DOUBLE / STRING
  // / VOID for JSON null / SQL NULL for an absent field), mirroring
  // Python json.loads typing. All native Catalyst expressions — no UDF.
  // ---------------------------------------------------------------------

  /** Raw JSON type tag of `field` inside a variant column. */
  def jsonTypeTag(v: Column, field: String): Column =
    schema_of_variant(try_variant_get(v, s"$$.$field", "variant"))

  /** Field absent or JSON null — the reference skips type checks for
    * these (the required rule owns them, validator.py:396-399). */
  def tagAbsentOrNull(t: Column): Column =
    t.isNull || t === "VOID" || t === "NULL"

  private def tagIsNumber(t: Column): Column =
    t === "BIGINT" || t === "DOUBLE" || t.startsWith("DECIMAL")

  /** Does the raw token satisfy the reference's expected-type tag?
    * (validator.py:326-362; note bool is excluded from int/float, and
    * int is accepted as float — pinned by test_validator.py:440-480.) */
  def lexTypeOk(expected: String, t: Column): Column = expected match {
    case "str" => t === "STRING"
    case "int" => t === "BIGINT"
    case "float" => tagIsNumber(t)
    case "str_or_null" => t === "STRING" || tagAbsentOrNull(t)
    case "int_or_str" => t === "BIGINT" || t === "STRING"
    case "str_or_null_or_number" =>
      t === "STRING" || tagIsNumber(t) || tagAbsentOrNull(t)
    case "float_or_null" => tagIsNumber(t) || tagAbsentOrNull(t)
    case "int_or_null" => t === "BIGINT" || tagAbsentOrNull(t)
    case "bool_or_null" => t === "BOOLEAN" || tagAbsentOrNull(t)
    case other => throw new IllegalArgumentException(s"unknown lexical type: $other")
  }

  /** Python-type spelling for "expected X, got Y" message parity. */
  def pyTypeName(t: Column): Column =
    when(t === "BOOLEAN", "bool")
      .when(t === "BIGINT", "int")
      .when(t === "DOUBLE" || t.startsWith("DECIMAL"), "float")
      .when(t === "STRING", "str")
      .when(tagAbsentOrNull(t), "NoneType")
      .when(t.startsWith("ARRAY"), "list")
      .otherwise("dict")

  private val expectedText = Map(
    "str" -> "string", "int" -> "int", "float" -> "float",
    "str_or_null" -> "string or null", "int_or_str" -> "int or string",
    "str_or_null_or_number" -> "string, number, or null",
    "float_or_null" -> "float or null", "int_or_null" -> "int or null",
    "bool_or_null" -> "bool or null",
  )

  /** P10 rule: fires when the field is present (not JSON-null) with a
    * lexically wrong token type. Error text matches the reference's
    * `expected <type>, got <pytype>` (validator.py:326-362). */
  def typeRule(v: Column, field: String, expected: String): Rule = {
    val t = jsonTypeTag(v, field)
    Rule(
      s"$field: expected ${expectedText(expected)}",
      !tagAbsentOrNull(t) && !lexTypeOk(expected, t),
      Some(concat(
        lit(s"$field: expected ${expectedText(expected)}, got "), pyTypeName(t))),
    )
  }

  // ---------------------------------------------------------------------
  // Rule = named predicate over a row; violation yields the error label.
  // Error label convention follows the reference: the text before the
  // first ':' is the error *type* used for stats (validator.py:496-505).
  // ---------------------------------------------------------------------

  final case class Rule(label: String, violated: Column, message: Option[Column] = None) {
    /** Message emitted into the errors array; defaults to the label. */
    def messageCol: Column = message.getOrElse(lit(label))
  }

  /** Default presence test: post-read column is null (absent JSON
    * fields read as null under schema-on-read). */
  val colMissing: String => Column = n => col(n).isNull

  /** Variant-aware presence test for the ingest pipeline: a field is
    * "missing" only when the parsed column is null AND the raw token is
    * absent or JSON null — so a wrong-typed token (e.g. a bool in an
    * int field, which schema-on-read nulls out) is reported by its P10
    * type rule, not as missing (reference validator.py:396-399 checks
    * the raw dict, where `True` is present). */
  def variantMissing(v: Column): String => Column =
    n => col(n).isNull && tagAbsentOrNull(jsonTypeTag(v, n))

  /** P9: required field must be present (non-null under schema-on-read,
    * where an absent JSON field reads as null — reference
    * validator.py:396-399). */
  def required(name: String, isMissing: String => Column = colMissing): Rule =
    Rule(s"missing required field: $name", isMissing(name))

  /** A required field with a validation predicate: null counts as
    * missing, non-null failing the predicate counts as invalid —
    * mirrors the reference's two-step check (validator.py:396-414). */
  def requiredWith(
      name: String,
      pred: Column => Column,
      errText: String,
      isMissing: String => Column = colMissing,
  ): Seq[Rule] =
    Seq(
      required(name, isMissing),
      Rule(s"$name: $errText", col(name).isNotNull && !pred(col(name))),
    )

  /** Optional field: checked only when present (validator.py:417-423). */
  def optionalWith(name: String, pred: Column => Column, errText: String): Rule =
    Rule(s"$name: $errText", col(name).isNotNull && !pred(col(name)))

  /** Envelope rules shared by every source (reference validator.py
    * schema tables :123-276: extraction_run_id uuid, created_at_ms +
    * timestamp_ms positive non-future). */
  def envelopeRules(nowMs: Long, isMissing: String => Column = colMissing): Seq[Rule] =
    requiredWith("extraction_run_id", isUuid, "invalid UUID format", isMissing) ++
      requiredWith("created_at_ms", isPositiveTimestamp(_, nowMs),
        "invalid timestamp (must be positive and not in future)", isMissing) ++
      requiredWith("timestamp_ms", isPositiveTimestamp(_, nowMs),
        "invalid timestamp (must be positive and not in future)", isMissing)
}
