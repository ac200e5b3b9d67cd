package graft.validate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.validate.Rules.Rule

/** Record validation pipeline (reference operators P17/P18 + A12).
  *
  * The reference validates record-by-record in Python, collecting *all*
  * errors per record (src/validator.py:390-426), splits valid/invalid,
  * and aggregates an error-type histogram with a 10-error sample
  * (validator.py:469-524). Here the whole pass is one narrow projection:
  * an `errors` array column built from `when` expressions — no row
  * loop, no UDF, no shuffle until the stats aggregation.
  */
object Validator {

  val ErrorsCol = "_errors"

  /** P17: annotate every row with its full violation list. */
  def annotate(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val errs = array(rules.map(r =>
      when(coalesce(r.violated, lit(false)), r.messageCol)): _*)
    df.withColumn(ErrorsCol, filter(errs, e => e.isNotNull))
  }

  def isValid: Column = size(col(ErrorsCol)) === 0

  /** P18: valid branch (drops the annotation column). */
  def validRecords(annotated: DataFrame): DataFrame =
    annotated.filter(isValid).drop(ErrorsCol)

  /** P18: invalid branch, annotation kept for reporting. */
  def invalidRecords(annotated: DataFrame): DataFrame =
    annotated.filter(!isValid)

  /** Error *type* = text before the first ':' (reference
    * validator.py:496-505). */
  def errorType(c: Column): Column =
    when(instr(c, ":") > 0, substring_index(c, ":", 1)).otherwise(c)

  /** Error-type histogram over the invalid branch (reference
    * validator.py:109-119): one shuffle on the (tiny) error-type key. */
  def errorStats(annotated: DataFrame): DataFrame =
    annotated
      .select(explode(col(ErrorsCol)).as("error"))
      .groupBy(errorType(col("error")).as("error_type"))
      .agg(count(lit(1)).as("error_count"))

  /** A12/report counts: single-row summary (valid + invalid = total —
    * the conservation law asserted by reference tests
    * tests/test_validator.py:314-350). */
  def summary(annotated: DataFrame): DataFrame =
    annotated.agg(
      count(lit(1)).as("total_records"),
      sum(when(isValid, 1L).otherwise(0L)).as("valid_records"),
      sum(when(!isValid, 1L).otherwise(0L)).as("invalid_records"),
    )

  /** Driver-side report mirroring the reference's ValidationReport
    * (validator.py:88-119): counts, per-type histogram, first-N sample
    * errors. Two Spark actions over a cached annotated frame. */
  final case class Report(
      total: Long,
      valid: Long,
      invalid: Long,
      duplicates: Long,
      errorCounts: Map[String, Long],
      sampleErrors: Seq[String],
  )

  val SampleErrorCap = 10 // reference validator.py:54-60

  /** `corrupt` = lines the JSON parser could not read at all; they
    * never reach the rule engine but ARE part of the input, so they
    * count as invalid (with their own histogram bucket) — otherwise a
    * file of pure garbage reports total=0 invalid=0 and sails through
    * the strict gate. */
  def report(annotated: DataFrame, duplicates: Long = 0L, corrupt: Long = 0L): Report = {
    val row = summary(annotated).head()
    val counts = errorStats(annotated)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    val samples = annotated
      .select(explode(col(ErrorsCol)).as("error"))
      .limit(SampleErrorCap)
      .collect()
      .map(_.getString(0))
      .toSeq
    val withCorrupt =
      if (corrupt > 0) counts + ("_corrupt: unparseable JSON line" -> corrupt) else counts
    Report(row.getLong(0) + corrupt, row.getLong(1), row.getLong(2) + corrupt,
      duplicates, withCorrupt, samples)
  }
}
