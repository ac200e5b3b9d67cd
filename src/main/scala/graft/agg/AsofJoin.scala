package graft.agg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join: for each left row, the single most
  * recent right row with the same key and right-time ≤ left-time —
  * the attribution / market-data / feature-lookup join Spark has no
  * built-in operator for.
  *
  * Implementation is the union + keyed-window form, not a range join:
  * tag both sides, union them, sort each key's rows by (time, side)
  * inside ONE window, and carry the last-seen right-side attributes
  * forward with `last(_, ignoreNulls = true)` over the unbounded
  * preceding frame. Right rows sort before left rows at an equal
  * timestamp, giving the inclusive (≤) match DuckDB's ASOF JOIN
  * implements.
  *
  * Scale shape: exactly one shuffle (hash partition by key for the
  * window), no time-range cross-product, no broadcast requirement on
  * either side — the classic alternatives (range-condition join,
  * per-left-row subquery) are quadratic per key or per-row. Skewed
  * keys concentrate in single window partitions; the standard fix is
  * the same time-bucketing salt the dedup operators use, layered on
  * top when one key's history outgrows an executor.
  *
  * Precondition for a deterministic result: (key, rightTime) is unique
  * on the right side — with duplicates the carried row among equal
  * timestamps is tie-ambiguous (as it is in any engine's ASOF).
  */
object AsofJoin {

  /** Left-outer as-of join. `rightValueCols` are the right-side
    * attributes to carry; they must not collide with left column
    * names. Unmatched left rows keep nulls. */
  def asofJoinLast(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTime: String,
      rightTime: String,
      rightValueCols: Seq[String],
  ): DataFrame = {
    val l = left.withColumn("_t", col(leftTime)).withColumn("_side", lit(1))
    val r = right
      .select((keyCols.map(col) :+ col(rightTime).as("_t")) ++ rightValueCols.map(col): _*)
      .withColumn("_side", lit(0))
    // unionByName(allowMissingColumns): left rows get null right-value
    // columns (to be filled), right rows get null left columns (to be
    // filtered).
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col("_t").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rightValueCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    filled.filter(col("_side") === 1).drop("_side", "_t")
  }

  /** Strict (<) variant: right rows at exactly the left timestamp do
    * NOT match. Same plan shape; left rows sort first at equal time. */
  def asofJoinLastStrict(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTime: String,
      rightTime: String,
      rightValueCols: Seq[String],
  ): DataFrame = {
    val l = left.withColumn("_t", col(leftTime)).withColumn("_side", lit(0))
    val r = right
      .select((keyCols.map(col) :+ col(rightTime).as("_t")) ++ rightValueCols.map(col): _*)
      .withColumn("_side", lit(1))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col("_t").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val filled = rightValueCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    filled.filter(col("_side") === 0).drop("_side", "_t")
  }
}
