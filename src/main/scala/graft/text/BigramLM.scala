package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bigram language-model document scoring with Laplace smoothing —
  * one rung up the n-gram ladder from [[UnigramLM]] and one rung below
  * the KenLM 5-gram CCNet uses (Wenzek et al. 2020): each document's
  * mean negative ln p(w2 | w1) under the corpus's own smoothed bigram
  * distribution. Where the unigram score flags rare-token soup, the
  * bigram score additionally flags IMPROBABLE TRANSITIONS — shuffled
  * or template-stitched text whose unigram profile looks normal.
  *
  * Model: tokens outside the top-`topV` vocabulary map to `<unk>`
  * (the standard open-vocabulary closure), then
  * `p(w2|w1) = (c(w1,w2) + 1) / (c(w1) + V)` where `V` = realized
  * vocabulary size incl. `<unk>` — all rational arithmetic on counts,
  * so two engines computing the same counts produce bit-identical
  * probabilities, and per-doc surprisal sums in DECIMAL(18,12) are
  * exact and order-free (the [[UnigramLM]] determinism recipe).
  *
  * Scale design (100 TB):
  *   - Raw bigram-type cardinality is unbounded; the `<unk>` mapping
  *     bounds the model at (topV+1)² types BEFORE counting, so the
  *     count aggregates map-side-combine to vocab-bounded frames and
  *     both model tables broadcast. No corpus-sized shuffle exists in
  *     the whole plan — the only per-row shuffle is the final per-doc
  *     aggregate, which map-combines to one row per doc.
  *   - Three corpus scans (unigram vocab, bigram counts, scoring) —
  *     a corpus-relative bigram statistic cannot do fewer than two;
  *     the vocab scan is the price of the self-trained cap and is
  *     shared via an action-scoped cache of the vocab-sized counts.
  *   - The bigram stream itself is never materialized: it is a narrow
  *     explode over the token array, fused into each scan.
  */
object BigramLM {

  val Unk = "<unk>"

  /** Positional bigram stream (idCol, w1, w2) — empty docs and
    * single-token docs contribute no rows. `explode_outer` + null
    * filter rather than `explode`: InferFiltersFromGenerate would
    * re-inline the bound token array into a `size(...) > 0` pre-filter
    * lambda (the tp6 regression), and the outer generate skips that
    * rule. */
  private def bigrams(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = TextAnalysis.normalizedTokens(col(textCol))
    df.select(col(idCol), toks.as("_t"))
      .select(col(idCol),
        explode_outer(arrays_zip(
          slice(col("_t"), lit(1), greatest(size(col("_t")) - 1, lit(0))),
          slice(col("_t"), lit(2), greatest(size(col("_t")) - 1, lit(0))))).as("_bg"))
      .filter(col("_bg").isNotNull)
      .select(col(idCol), col("_bg.0").as("w1"), col("_bg.1").as("w2"))
  }

  /** Map both sides of the bigram stream through the capped
    * vocabulary: in-vocab tokens pass through, everything else becomes
    * [[Unk]]. Two broadcast left joins — the stream never shuffles. */
  private def mapped(bg: DataFrame, vocab: DataFrame): DataFrame = {
    val v1 = broadcast(vocab.select(col("token").as("w1"), lit(true).as("_in1")))
    val v2 = broadcast(vocab.select(col("token").as("w2"), lit(true).as("_in2")))
    bg.join(v1, Seq("w1"), "left").join(v2, Seq("w2"), "left")
      .withColumn("w1", when(col("_in1"), col("w1")).otherwise(lit(Unk)))
      .withColumn("w2", when(col("_in2"), col("w2")).otherwise(lit(Unk)))
      .drop("_in1", "_in2")
  }

  /** Per-document mean negative ln p(w2|w1), Laplace-smoothed, vocab
    * capped at `topV` (+ `<unk>`). Output: idCol, n_bigrams (int),
    * mean_neg_logprob (double, 6 dp; 0.0 for docs with < 2 tokens). */
  def bigramScores(
      df: DataFrame,
      idCol: String,
      textCol: String,
      topV: Int,
  ): DataFrame = {
    val counts = graft.quality.CacheScope.cachedUntilAction(
      UnigramLM.tokenCounts(df, textCol))
    val vocab = counts.orderBy(col("c").desc, col("token")).limit(topV)
    // realized model size: |vocab| + 1 for <unk> — in-plan, broadcast,
    // so tiny corpora (|vocab| < topV) stay engine-agnostic
    val vsize = vocab.agg((count(lit(1)) + 1).as("vsz"))

    val bg = bigrams(df, idCol, textCol)
    val m = mapped(bg.select(col(idCol), col("w1"), col("w2")), vocab)
    // c12 is the vocab-BOUNDED bigram table (≤ (topV+1)² rows), and
    // c1(w1) = Σ_w2 c12(w1, w2) exactly — deriving the unigram context
    // counts from it removes a third full corpus pass (the old
    // m.groupBy(w1) re-ran the explode+mapping chain end to end).
    // Cached so the c1 derivation and the scoring broadcast share one
    // evaluation of the bigram aggregate.
    val c12 = graft.quality.CacheScope.cachedUntilAction(
      m.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12")))
    val c1 = c12.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))

    val scored = m
      .join(broadcast(c12), Seq("w1", "w2"))
      .join(broadcast(c1), Seq("w1"))
      .crossJoin(broadcast(vsize))
      .withColumn("s",
        (-log((col("c12") + 1).cast("double") / (col("c1") + col("vsz"))))
          .cast("decimal(18,12)"))
    val per = scored
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("int").as("n_bigrams"), sum(col("s")).as("ssum"))
    df.select(col(idCol))
      .join(per, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("n_bigrams"), lit(0)).as("n_bigrams"),
        when(col("n_bigrams").isNull, lit(0.0))
          .otherwise(round(col("ssum").cast("double") / col("n_bigrams"), 6))
          .as("mean_neg_logprob"))
  }
}
