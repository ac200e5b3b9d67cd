package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram language-model document scoring: each document's mean
  * negative log-probability under the corpus's own unigram
  * distribution — the cheap, model-free stand-in for the LM-perplexity
  * quality bucketing CCNet uses (Wenzek et al. 2020 score documents
  * with a KenLM model; the operator shape — score each token against a
  * broadcast probability table, aggregate per doc — is identical).
  * High scores = token sequences improbable under the corpus
  * (gibberish, rare-token soup); low scores = stopword-heavy prose.
  *
  * Scale design:
  *   - The vocabulary is CAPPED at the top `topV` tokens (deterministic
  *     order: count desc, token asc) and BROADCAST; out-of-vocabulary
  *     tokens take the floor probability 1/total. A 100 TB corpus has
  *     unbounded raw vocabulary but the cap bounds the broadcast, and
  *     the per-token scoring join stays map-side.
  *   - Per-token surprisals are summed as DECIMAL(18,12), not DOUBLE:
  *     decimal addition is exact and order-free, so the aggregate is
  *     deterministic under any partitioning (the same trick the money
  *     rollups use) and SQL-replayable.
  *   - Two shuffles total (vocab count, per-doc aggregate) plus the
  *     tiny vocab/total broadcasts.
  */
object UnigramLM {

  /** Full corpus unigram counts (vocab-sized, i.e. tiny relative to
    * the corpus). */
  def tokenCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextAnalysis.normalizedTokens(col(textCol))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("c"))

  /** Corpus unigram counts, capped to the `topV` most frequent tokens
    * (ties broken by token text). */
  def vocabulary(df: DataFrame, textCol: String, topV: Int): DataFrame =
    tokenCounts(df, textCol)
      .orderBy(col("c").desc, col("token"))
      .limit(topV)

  /** Per-document mean negative ln-probability. Output: idCol,
    * n_tokens (int), mean_neg_logprob (double, 6 dp; 0.0 for empty
    * docs). */
  def unigramScores(
      df: DataFrame,
      idCol: String,
      textCol: String,
      topV: Int,
  ): DataFrame = {
    val toks = df.select(
      col(idCol),
      explode(TextAnalysis.normalizedTokens(col(textCol))).as("token"))
    // Cache the vocab-sized counts so BOTH the capped vocabulary and
    // the total derive from one counting pass: the corpus is scanned
    // exactly twice (counts, scoring) — the 100 TB floor for a
    // corpus-relative statistic — instead of three times.
    // Action-scoped: released when the caller's query completes.
    val counts = graft.quality.CacheScope.cachedUntilAction(tokenCounts(df, textCol))
    val vocab = counts.orderBy(col("c").desc, col("token")).limit(topV)
    val total = counts.agg(sum(col("c")).as("n"))
    val scored = toks
      .join(broadcast(vocab), Seq("token"), "left")
      .crossJoin(broadcast(total))
      // OOV floor: count 1. Decimal cast makes the per-doc sum exact
      // and order-free.
      .withColumn("s",
        (-log(coalesce(col("c"), lit(1L)).cast("double") / col("n"))).cast("decimal(18,12)"))
    val per = scored
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("int").as("n_tokens"), sum(col("s")).as("ssum"))
    df.select(col(idCol))
      .join(per, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("n_tokens"), lit(0)).as("n_tokens"),
        when(col("n_tokens").isNull, lit(0.0))
          .otherwise(round(col("ssum").cast("double") / col("n_tokens"), 6))
          .as("mean_neg_logprob"))
  }
}
