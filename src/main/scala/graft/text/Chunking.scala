package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Overlapping token-window chunking: split each document into chunks
  * of `width` tokens starting every `stride` tokens (stride < width ⇒
  * overlap; stride = width ⇒ a partition of the doc) — the standard
  * preprocessing step for context-window-bounded training and
  * retrieval corpora. Chunk i of a doc covers tokens
  * [i·stride, i·stride + width); chunks start while i·stride < n, so
  * every token lands in at least one chunk and only the last chunk
  * may run short.
  *
  * Scale shape: completely narrow — tokens are bound once as a
  * column, the start offsets come from `sequence` (array arithmetic,
  * no join), and the per-chunk rows come from one generate. No
  * shuffle at all; chunking fuses into the scan like the samplers.
  * (explode_outer, not explode: InferFiltersFromGenerate would inline
  * the bound token array back into a pre-filter for a plain explode —
  * the tp6 lesson.)
  */
object Chunking {

  /** Output: idCol, chunk_no (0-based), chunk_text (tokens re-joined
    * with single spaces), n_tokens. Token-less documents yield no
    * chunks. */
  def chunkByTokens(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      width: Int,
      stride: Int,
  ): DataFrame = {
    require(width > 0, s"width must be positive, got $width")
    require(stride > 0 && stride <= width,
      s"stride must be in [1, width], got $stride (width $width)")
    docs
      .withColumn("_toks", TextAnalysis.normalizedTokens(col(textCol)))
      .withColumn("_n", size(col("_toks")))
      .filter(col("_n") > 0)
      .withColumn("_start",
        explode_outer(sequence(lit(0), col("_n") - 1, lit(stride))))
      .withColumn("chunk_no", (col("_start") / stride).cast("int"))
      .withColumn("_chunk", slice(col("_toks"), col("_start") + 1, lit(width)))
      .select(col(idCol), col("chunk_no"),
        concat_ws(" ", col("_chunk")).as("chunk_text"),
        size(col("_chunk")).as("n_tokens"))
  }
}
