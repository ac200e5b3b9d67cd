package graft.agg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join: for each left row, the single most
  * recent right row with the same key and right-time ≤ left-time —
  * the attribution / market-data / feature-lookup join Spark has no
  * built-in operator for.
  *
  * Implementation is the union + keyed-window form, not a range join:
  * tag both sides, union them, sort each key's rows by (time, side)
  * inside ONE window, and carry the last-seen right row forward with
  * `last(_, ignoreNulls = true)` over the unbounded preceding frame.
  * All carried attributes travel inside ONE struct (non-null whenever
  * a right row exists, even if every attribute in it is null), so the
  * result always comes from a single right row — filling each column
  * independently would stitch attributes from different rows whenever
  * the matched row holds a null. Right rows sort before left rows at
  * an equal timestamp, giving the inclusive (≤) match DuckDB's ASOF
  * JOIN implements.
  *
  * Null keys never match (standard join semantics): right rows with a
  * null key component are dropped up front, which leaves left null-key
  * rows nothing to carry.
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
  ): DataFrame =
    unionWindowJoin(left, right, keyCols, leftTime, rightTime, rightValueCols,
      leftSide = 1, frameEnd = Window.currentRow)

  /** Strict (<) variant: right rows at exactly the left timestamp do
    * NOT match. Same plan shape; left rows sort first at equal time,
    * and the frame stops one row short of the current left row. */
  def asofJoinLastStrict(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTime: String,
      rightTime: String,
      rightValueCols: Seq[String],
  ): DataFrame =
    unionWindowJoin(left, right, keyCols, leftTime, rightTime, rightValueCols,
      leftSide = 0, frameEnd = -1)

  private def unionWindowJoin(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTime: String,
      rightTime: String,
      rightValueCols: Seq[String],
      leftSide: Int,
      frameEnd: Long,
  ): DataFrame = {
    // enforce what the scaladoc promises — a colliding name would
    // silently overwrite the left column in the foldLeft expansion
    val collisions = rightValueCols.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty,
      s"rightValueCols collide with left columns: ${collisions.mkString(", ")}")
    val l = left.withColumn("_t", col(leftTime)).withColumn("_side", lit(leftSide))
    val r = right
      // null-key right rows can never match any left row
      .filter(keyCols.map(col(_).isNotNull).reduce(_ && _))
      .select(keyCols.map(col) :+ col(rightTime).as("_t")
        :+ struct(rightValueCols.map(col): _*).as("_rrow"): _*)
      .withColumn("_side", lit(1 - leftSide))
    // unionByName(allowMissingColumns): left rows get a null _rrow (to
    // be filled), right rows get null left columns (to be filtered).
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col("_t").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, frameEnd)
    val filled = unioned.withColumn("_rrow", last(col("_rrow"), ignoreNulls = true).over(w))
    val expanded = rightValueCols.foldLeft(filled) { (df, c) =>
      df.withColumn(c, col("_rrow").getField(c))
    }
    expanded.filter(col("_side") === leftSide).drop("_side", "_t", "_rrow")
  }
}
