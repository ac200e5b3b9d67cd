package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting. AQE's skew-join splitting covers
  * joins; salting covers the cases AQE does not: a single hot group in
  * an aggregation, or a first-wins window where one natural key (one
  * plant misconfigured upstream emitting most rows) would serialize
  * into one task.
  *
  * Pattern: two-phase aggregate — partial per (key, salt), final per
  * key. The salt is derived deterministically from a tiebreak column
  * (never random: re-runs must produce identical plans and results).
  */
object Salting {

  def saltCol(tiebreak: Column, buckets: Int): Column =
    pmod(hash(tiebreak), lit(buckets))

  /** Two-phase sum with salted partials: groupBy(keys :+ salt) then
    * groupBy(keys). Shuffle 1 spreads the hot key over `buckets`
    * tasks; shuffle 2 carries only `buckets` rows per key. */
  def saltedSum(
      df: DataFrame,
      keys: Seq[Column],
      measure: Column,
      tiebreak: Column,
      buckets: Int = 16,
  ): DataFrame = {
    val named = keys.zipWithIndex.map { case (c, i) => c.as(s"_k$i") }
    val keyNames = keys.indices.map(i => col(s"_k$i"))
    df.groupBy((named :+ saltCol(tiebreak, buckets).as("_salt")): _*)
      .agg(sum(measure).as("_partial"))
      .groupBy(keyNames: _*)
      .agg(sum(col("_partial")).as("total"))
  }

  /** Salted first-wins dedup: phase 1 takes the per-(key, salt)
    * winner, phase 2 the winner among ≤ `buckets` survivors per key.
    * The global minimum over `order` survives both phases, so the
    * result equals unsalted [[Dedup.firstWins]] while the hot key's
    * sort runs as `buckets` parallel tasks. */
  def saltedFirstWins(
      df: DataFrame,
      keys: Seq[Column],
      order: Seq[Column],
      buckets: Int = 16,
  ): DataFrame = {
    val salted = df.withColumn("_salt", saltCol(coalesce(order.head, lit(0)), buckets))
    val phase1 = Dedup.firstWins(salted, keys :+ col("_salt"), order)
    Dedup.firstWins(phase1, keys, order).drop("_salt")
  }
}
