package graft.agg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join without a cross product: each left row joins
  * the right rows with the same key and a timestamp inside a lookback
  * window ending at the left row — sessionization, attribution
  * windows, feature aggregation over trailing activity.
  *
  * The naive formulations are scale-killers: a join on
  * `key AND rt BETWEEN lt - w AND lt` gives Spark only the equi-part
  * for hashing and degenerates per key; a cross join + filter is
  * quadratic. The bucketed form here is the standard linear shape:
  *
  *   - both sides bucket time by the window width w;
  *   - a right row at time rt can only match left rows in buckets
  *     floor(rt/w) and floor(rt/w)+1, so the right side is duplicated
  *     exactly 2x (independent of data volume or window width) into
  *     those candidate buckets;
  *   - the join is a plain equi-join on (key, bucket) — one shuffle of
  *     each side — followed by the exact interval filter.
  *
  * Per-(key, bucket) group size is bounded by per-key activity within
  * one window width, which is what bounds executor memory at 100 TB;
  * a pathologically hot key falls back to the same salting used by
  * the dedup operators.
  */
object RangeJoin {

  /** Half-open lookback join: right rows with
    * `leftTime - windowUs <= rightTime < leftTime`, same key. Time
    * columns are microsecond longs with distinct names on the two
    * sides; key columns share names. */
  def lookbackJoin(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTime: String,
      rightTime: String,
      windowUs: Long,
  ): DataFrame = {
    require(windowUs > 0, s"window must be positive, got $windowUs")
    // exact integral division (floor(x/w) via `div` for the
    // non-negative timestamps this serves): double division could in
    // principle misassign a value sitting exactly on a bucket
    // boundary, and the 2x-coverage invariant depends on both sides
    // bucketing identically
    val lb = left.withColumn("_b", expr(s"`$leftTime` div $windowUs"))
    val rb = right
      .withColumn("_b0", expr(s"`$rightTime` div $windowUs"))
      .withColumn("_b", explode(array(col("_b0"), col("_b0") + 1)))
      .drop("_b0")
    lb.join(rb, keyCols :+ "_b")
      .filter(col(rightTime) >= col(leftTime) - windowUs && col(rightTime) < col(leftTime))
      .drop("_b")
  }
}
