package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic global shuffle for training-data serving: the step
  * after curation/packing where the corpus gets an order to be read
  * in. A plain `ORDER BY rand()` is neither reproducible nor
  * restart-safe; here shard and position are pure functions of
  * (salt, key) — re-runs, retries, and other engines agree
  * row-for-row, and a resumed job can recompute any shard's order
  * without global state. Salt selects an independent epoch
  * permutation (new salt per epoch = fresh shuffle, same corpus).
  *
  * Scale shape: one hash shuffle on shard (numShards-way) plus a
  * per-shard sort — exactly the `repartition + sortWithinPartitions`
  * write pattern; there is never a global sort or a single-partition
  * window. Shard sizes are i.i.d. binomial in the corpus size, so no
  * shard skews beyond sampling noise.
  */
object TrainOrder {

  /** md5-derived shard in [0, numShards) — first 8 hex digits parsed
    * as an unsigned int (fits a long), mod the shard count. */
  def shardOf(keyCol: Column, numShards: Int, salt: String = ""): Column = {
    require(numShards > 0, s"numShards must be positive, got $numShards")
    val h = md5(concat_ws(":", lit(salt), keyCol.cast("string")))
    (conv(substring(h, 1, 8), 16, 10).cast("long") % numShards).cast("int")
  }

  /** Assign every row a `shard` and a 1-based `pos` within that shard,
    * ordered by the md5 of the (salted) key with the key itself as the
    * total-order tiebreak. */
  def shardOrder(
      docs: DataFrame,
      keyCol: Column,
      numShards: Int,
      salt: String = "",
  ): DataFrame = {
    require(numShards > 0, s"numShards must be positive, got $numShards")
    docs
      .withColumn("_h", md5(concat_ws(":", lit(salt), keyCol.cast("string"))))
      .withColumn("shard",
        (conv(substring(col("_h"), 1, 8), 16, 10).cast("long") % numShards).cast("int"))
      .withColumn("pos",
        row_number().over(Window.partitionBy(col("shard")).orderBy(col("_h"), keyCol)))
      .drop("_h")
  }
}
