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
    reportWith(annotated, row.getLong(0), row.getLong(1), row.getLong(2),
      duplicates, corrupt)
  }

  /** [[report]] with the summary counts supplied by the caller — the
    * load pipeline folds total/valid/invalid into its one batch-stats
    * aggregate, so the whole report costs ONE further action: a
    * per-message count collapse (bounded by the distinct message
    * vocabulary, ≤ rules × messages) from which both the type
    * histogram and the capped sample are derived driver-side. The
    * sample is deterministic (message-ordered, with multiplicity up
    * to the cap) where the old limit-over-instances form surfaced
    * arbitrary partition order. */
  def reportWith(
      annotated: DataFrame,
      total: Long,
      valid: Long,
      invalid: Long,
      duplicates: Long = 0L,
      corrupt: Long = 0L,
  ): Report = {
    val byMsg = annotated
      .select(explode(col(ErrorsCol)).as("error"))
      .groupBy("error").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .sortBy(_._1)
    // driver twin of [[errorType]] (instr(c, ":") > 0 ⇔ indexOf >= 0)
    def errorTypeOf(m: String): String = {
      val i = m.indexOf(':'); if (i >= 0) m.substring(0, i) else m
    }
    val counts = byMsg.groupBy { case (m, _) => errorTypeOf(m) }
      .map { case (t, ms) => t -> ms.map(_._2).sum }
    val samples = {
      val out = Seq.newBuilder[String]
      var left = SampleErrorCap
      byMsg.foreach { case (m, n) =>
        val take = math.min(left, math.min(n, Int.MaxValue.toLong).toInt)
        out ++= Seq.fill(take)(m)
        left -= take
      }
      out.result()
    }
    val withCorrupt =
      if (corrupt > 0) counts + ("_corrupt: unparseable JSON line" -> corrupt) else counts
    Report(total + corrupt, valid, invalid + corrupt,
      duplicates, withCorrupt, samples)
  }
}
