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
}
