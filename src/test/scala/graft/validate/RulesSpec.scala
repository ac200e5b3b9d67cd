package graft.validate

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Mirrors the reference's rule edge cases
  * (reference tests/test_validator.py:91-118, :203-268, :440-480). */
class RulesSpec extends SparkSpec {
  import spark.implicits._

  private def evalBool(c: org.apache.spark.sql.Column, rows: Seq[String]): Seq[Option[Boolean]] = {
    rows.toDF("v").select(c.as("r")).collect().toSeq
      .map(r => if (r.isNullAt(0)) None else Some(r.getBoolean(0)))
  }

  test("uuid: canonical form accepted, variants rejected") {
    val r = evalBool(Rules.isUuid(col("v")), Seq(
      "550e8400-e29b-41d4-a716-446655440000", // valid
      "550E8400-E29B-41D4-A716-446655440000", // valid upper
      "not-a-uuid",
      "550e8400e29b41d4a716446655440000", // no dashes
      "550e8400-e29b-41d4-a716-44665544000g", // bad hex
    ))
    assert(r == Seq(Some(true), Some(true), Some(false), Some(false), Some(false)))
  }

  test("state codes: case-insensitive two-letter, full names rejected") {
    val r = Seq("AL", "al", "DC", "PR", "California", "ZZ", "")
      .toDF("v").select(Rules.isUsStateCode(col("v")).as("r"))
      .collect().map(_.getBoolean(0)).toSeq
    assert(r == Seq(true, true, true, true, false, false, false))
  }

  test("positive timestamp: rejects non-positive and far-future") {
    val now = 1700000000000L
    val vals = Seq(1699999999999L, now, now + Rules.MaxFutureBufferMs,
      now + Rules.MaxFutureBufferMs + 1, 0L, -5L)
    val r = vals.toDF("v")
      .select(Rules.isPositiveTimestamp(col("v"), now).as("r"))
      .collect().map(_.getBoolean(0)).toSeq
    assert(r == Seq(true, true, true, false, false, false))
  }

  test("non-empty string: whitespace-only is empty") {
    val r = Seq("x", "  ", "", " a ").toDF("v")
      .select(Rules.isNonEmptyString(col("v")).as("r"))
      .collect().map(_.getBoolean(0)).toSeq
    assert(r == Seq(true, false, false, true))
  }

  test("non-negative / positive numbers") {
    val vals = Seq(0.0, 1.5, -0.1)
    val nn = vals.toDF("v").select(Rules.isNonNegative(col("v"))).collect().map(_.getBoolean(0)).toSeq
    val p = vals.toDF("v").select(Rules.isPositive(col("v"))).collect().map(_.getBoolean(0)).toSeq
    assert(nn == Seq(true, true, false))
    assert(p == Seq(false, true, false))
  }

  // --- P10 lexical type checks (reference test_validator.py:440-480) ---

  private def typeViolations(line: String, field: String, expected: String): Seq[String] = {
    val df = Seq(line).toDF("line").withColumn("_v", try_parse_json(col("line")))
    val r = Rules.typeRule(col("_v"), field, expected)
    df.select(when(coalesce(r.violated, lit(false)), r.messageCol).as("m"))
      .collect().toSeq.flatMap(row => Option(row.getString(0)))
  }

  test("P10: boolean is not accepted as int (test_boolean_not_int)") {
    val errs = typeViolations("""{"created_at_ms":true}""", "created_at_ms", "int")
    assert(errs == Seq("created_at_ms: expected int, got bool"))
  }

  test("P10: string is not accepted as float (test_string_not_accepted_as_float)") {
    val errs = typeViolations("""{"generation_mwh":"100.0"}""", "generation_mwh", "float")
    assert(errs == Seq("generation_mwh: expected float, got str"))
  }

  test("P10: int IS accepted as float (test_int_accepted_as_float)") {
    assert(typeViolations("""{"generation_mwh":100}""", "generation_mwh", "float").isEmpty)
    assert(typeViolations("""{"generation_mwh":100.5}""", "generation_mwh", "float").isEmpty)
  }

  test("P10: bool is not a float; absent / JSON-null fields are skipped") {
    assert(typeViolations("""{"generation_mwh":true}""", "generation_mwh", "float")
      == Seq("generation_mwh: expected float, got bool"))
    assert(typeViolations("""{}""", "generation_mwh", "float").isEmpty)
    assert(typeViolations("""{"generation_mwh":null}""", "generation_mwh", "float").isEmpty)
  }

  test("P10: int_or_str / str_or_null_or_number / int_or_null / bool_or_null edges") {
    assert(typeViolations("""{"utility_id":7}""", "utility_id", "int_or_str").isEmpty)
    assert(typeViolations("""{"utility_id":"7a"}""", "utility_id", "int_or_str").isEmpty)
    assert(typeViolations("""{"utility_id":1.5}""", "utility_id", "int_or_str")
      == Seq("utility_id: expected int or string, got float"))
    assert(typeViolations("""{"unit":5.5}""", "unit", "str_or_null_or_number").isEmpty)
    assert(typeViolations("""{"unit":true}""", "unit", "str_or_null_or_number")
      == Seq("unit: expected string, number, or null, got bool"))
    assert(typeViolations("""{"resolution_minutes":"60"}""", "resolution_minutes", "int_or_null")
      == Seq("resolution_minutes: expected int or null, got str"))
    assert(typeViolations("""{"in_gcpt_crosswalk":true}""", "in_gcpt_crosswalk", "bool_or_null").isEmpty)
    assert(typeViolations("""{"in_gcpt_crosswalk":1}""", "in_gcpt_crosswalk", "bool_or_null")
      == Seq("in_gcpt_crosswalk: expected bool or null, got int"))
  }
}
