package graft.validate

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** File-level validation behavior — mirrors reference
  * tests/test_validator.py:314-397 (mixed accounting, error stats,
  * conservation law valid+invalid = total). */
class ValidatorSpec extends SparkSpec {
  import spark.implicits._

  private val now = 1700000000000L

  private def rules = Seq(Rules.required("plant")) ++
    Rules.requiredWith("generation_mwh", Rules.isNonNegative, "must be non-negative number") ++
    Rules.requiredWith("timestamp_ms", Rules.isPositiveTimestamp(_, now),
      "invalid timestamp (must be positive and not in future)")

  private def df = Seq(
    (Some("A"), Some(10.0), Some(1690000000000L)), // valid
    (Some("B"), Some(-1.0), Some(1690000000000L)), // negative generation
    (None, Some(5.0), Some(1690000000000L)), // missing plant
    (Some("C"), Some(5.0), Some(now + 2 * Rules.MaxFutureBufferMs)), // future
    (Some("D"), None, Some(1690000000000L)), // missing generation
  ).toDF("plant", "generation_mwh", "timestamp_ms")

  test("split + conservation law") {
    val ann = Validator.annotate(df, rules)
    val row = Validator.summary(ann).head()
    assert(row.getLong(0) == 5) // total
    assert(row.getLong(1) == 1) // valid
    assert(row.getLong(2) == 4) // invalid
    assert(row.getLong(1) + row.getLong(2) == row.getLong(0))
    assert(Validator.validRecords(ann).select("plant").as[String].collect().toSeq == Seq("A"))
  }

  test("error stats histogram by error type (text before first colon)") {
    val ann = Validator.annotate(df, rules)
    val stats = Validator.errorStats(ann).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stats == Map(
      "missing required field" -> 2L,
      "generation_mwh" -> 1L,
      "timestamp_ms" -> 1L,
    ))
  }

  test("all-error collection: a record reports every violated rule") {
    val bad = Seq((None: Option[String], Some(-3.0), Some(-1L)))
      .toDF("plant", "generation_mwh", "timestamp_ms")
    val errs = Validator.annotate(bad, rules)
      .select(col(Validator.ErrorsCol)).as[Seq[String]].head()
    assert(errs.size == 3)
  }

  test("report caps sample errors at 10") {
    val many = (1 to 30).map(i => (None: Option[String], Some(1.0), Some(1690000000000L)))
      .toDF("plant", "generation_mwh", "timestamp_ms")
    val rep = Validator.report(Validator.annotate(many, rules))
    assert(rep.invalid == 30 && rep.sampleErrors.size == Validator.SampleErrorCap)
  }
}
