package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Budgeted sequence packing: assign documents to fixed-token-budget
  * packs ahead of tokenization, the step that turns a curated corpus
  * into trainer-shaped input groups.
  *
  * Distributed form: a running token total per group (one partitioned
  * window — `sum over (partition by group order by id)`) and
  * `pack_no = floor(exclusive_cumsum / budget)` — contiguous fill
  * where a document that straddles a boundary belongs to the pack it
  * started in (splitting/truncating the straddler is tokenizer-side
  * work, not engine work). This is the bin-FILL approximation of
  * greedy first-fit: deterministic, one shuffle on the group key, and
  * exactly reproducible in SQL — a sequential first-fit packer is
  * inherently order-serial and would collapse to a single partition.
  * Groups (e.g. source, or lang) bound each window's partition, which
  * is what keeps the window scalable at 100 TB: never order a global
  * window over the whole corpus.
  */
object Packing {

  /** Adds `pack_no` (0-based within each group) and `pack_cum_tokens`
    * (running total INCLUDING the current document). */
  def packByBudget(
      docs: DataFrame,
      idCol: String,
      tokensCol: Column,
      groupCols: Seq[String],
      budgetTokens: Long,
  ): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive: $budgetTokens")
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bound = docs.withColumn("_toks", tokensCol.cast("long"))
    bound
      .withColumn("pack_cum_tokens", sum(col("_toks")).over(w))
      .withColumn("pack_no",
        floor((col("pack_cum_tokens") - col("_toks")) / budgetTokens).cast("int"))
      .drop("_toks")
  }
}
