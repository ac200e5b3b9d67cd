package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination: find corpus documents that contain a
  * benchmark document's n-grams, scored by containment =
  * |corpus ∩ bench shingles| / |bench shingles| — the metric that
  * answers "how much of this eval item leaked into training data".
  *
  * Scale shape: the benchmark set is small by nature (eval suites are
  * thousands of items, the corpus is billions), so this is an
  * inverted-index join, never a cross product — benchmark shingles
  * explode into a broadcast table, corpus shingles explode and hash-
  * join against it (map-side, no shuffle of the corpus), and the only
  * exchange is the partial/final count aggregation over MATCHED
  * (doc, bench) pairs, whose cardinality is bounded by actual overlap
  * rather than corpus × benchmark.
  */
object Decontamination {

  /** (doc, bench_id, containment) for every corpus document whose
    * containment of a benchmark document reaches `threshold`.
    * Self-pairs (same id) are excluded: the benchmark is typically
    * drawn from, or keyed like, the corpus under test. */
  def containmentScores(
      corpus: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      benchIdCol: String,
      textCol: String,
      k: Int = 3,
      threshold: Double = 0.3,
  ): DataFrame = {
    // explode_outer, NOT explode: InferFiltersFromGenerate adds a
    // size(shingles) > 0 pre-filter to a plain explode and inlines the
    // whole tokenization chain inside the slice lambda — a full-text
    // regex split PER GRAM (measured 7.1 s → 1.4 s at sf0.1). The rule
    // skips outer generates; the null rows an empty array produces
    // self-eliminate in the inner join below.
    val cGrams = TextDedup.withShingles(corpus, textCol, k, "_sh")
      .select(col(idCol), explode_outer(col("_sh")).as("_gram"))
    val bGrams = TextDedup.withShingles(benchmark, textCol, k, "_sh")
      .select(col(benchIdCol).as("bench_id"),
        size(col("_sh")).as("_bench_size"), explode_outer(col("_sh")).as("_gram"))
    cGrams
      .join(broadcast(bGrams), "_gram")
      .filter(col(idCol) =!= col("bench_id"))
      // shingle lists are distinct per document, so matched row count
      // per (doc, bench) = |intersection|
      .groupBy(col(idCol), col("bench_id"), col("_bench_size"))
      .agg(count(lit(1)).as("_matched"))
      .withColumn("containment", round(col("_matched") / col("_bench_size"), 6))
      .filter(col("containment") >= threshold)
      .select(col(idCol), col("bench_id"), col("containment"))
  }

  /** [[containmentScores]] with a Bloom gate in front of the exact
    * join — the composition that survives a benchmark set too large to
    * broadcast. The benchmark's gram vocabulary packs into a
    * depth×width-bit filter ([[Sketches.bloomMasks]], ~3.5 KB at the
    * defaults) evaluated as a LITERAL narrow filter over the corpus
    * gram stream ([[Sketches.bloomTest]]): the gate costs a codegen'd
    * projection per gram — no join, no shuffle, no broadcast wait —
    * and only the survivors (true matches + the bounded-rate false
    * positives) reach the exact gram join, whose input is then sized
    * by actual overlap rather than the corpus. False negatives are
    * impossible by construction, so the output is IDENTICAL to the
    * ungated operator — `tp15` proves it by answering tp6's oracle SQL
    * verbatim, the td14/td15 pattern.
    *
    * At the scale where this matters the exact join is left unhinted:
    * while the benchmark grams fit the broadcast threshold Spark still
    * broadcasts them, and beyond it the planner degrades to a shuffled
    * hash join — of the gated survivor stream only, which is the whole
    * point of paying the gate. */
  def bloomGatedContainmentScores(
      corpus: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      benchIdCol: String,
      textCol: String,
      k: Int = 3,
      threshold: Double = 0.3,
      depth: Int = 7,
      width: Int = 4096,
  ): DataFrame = {
    val bGrams = TextDedup.withShingles(benchmark, textCol, k, "_sh")
      .select(col(benchIdCol).as("bench_id"),
        size(col("_sh")).as("_bench_size"), explode_outer(col("_sh")).as("_gram"))
    val masks = Sketches.bloomMasks(
      Sketches.bloomBitsOf(bGrams, "_gram", depth, width), depth, width)
    // explode_outer for the same InferFiltersFromGenerate reason as the
    // exact operator; the gate's hash chain (graft_token_hash = the
    // corpus-standard fnv1a→gmix64) binds AFTER the generate, so it
    // runs once per gram, never inside the tokenization lambda.
    TextDedup.withShingles(corpus, textCol, k, "_sh")
      .select(col(idCol), explode_outer(col("_sh")).as("_gram"))
      .filter(Sketches.bloomTest(
        call_function("graft_token_hash", col("_gram")), masks, width))
      .join(bGrams, "_gram")
      .filter(col(idCol) =!= col("bench_id"))
      .groupBy(col(idCol), col("bench_id"), col("_bench_size"))
      .agg(count(lit(1)).as("_matched"))
      .withColumn("containment", round(col("_matched") / col("_bench_size"), 6))
      .filter(col("containment") >= threshold)
      .select(col(idCol), col("bench_id"), col("containment"))
  }

  /** Per-document Bloom suspicion: the fraction of a document's
    * distinct k-grams that hit the benchmark-vocabulary filter — the
    * admission-time decontamination signal. Unlike
    * [[containmentScores]] (per-benchmark-document containment, an
    * exact join) this is ONE narrow projection: the gram array stays
    * an array, membership is [[Sketches.bloomTest]] inside a
    * higher-order `filter` over literal masks, and no explode, join,
    * shuffle or state exists anywhere — so the identical chain runs
    * unchanged on an unbounded stream (the curation-stream admission
    * gate) and costs a projection per document at any scale.
    *
    * Semantics: suspicion over-approximates benchmark overlap (false
    * positives at the filter's bounded rate, never false negatives),
    * so thresholding it quarantines a superset — route survivors of a
    * high threshold to the exact [[containmentScores]] join offline.
    * Output: id, `n_grams`, `n_suspect`, `suspicion` (exact rational
    * rounded at 6, engine-replayable). */
  def bloomSuspicionScores(
      df: DataFrame,
      idCol: String,
      textCol: String,
      masks: Array[Array[Long]],
      k: Int = 3,
      width: Int = 4096,
  ): DataFrame =
    // ONE native kernel call per document (graft_bloom_suspicion):
    // both counts in a single tight loop — FNV + depth bit probes per
    // gram — instead of interpreted per-gram HOF lambdas with
    // element_at probes. End-to-end the stage is shingle-chain-bound
    // (7.48 vs 7.43 s noop-sink at sf0.1): the kernel buys the simpler
    // plan and probe cost independent of depth/width. The kernel
    // skips the empty gram a zero-token document produces under the
    // clamped shingle slice (n_grams must be 0 there). Masks/width
    // ride as plan literals; the chain stays stateless and narrow, so
    // it still gates an unbounded stream.
    df.withColumn("_s", call_function("graft_bloom_suspicion",
        TextDedup.shingles(col(textCol), k),
        typedLit(masks), lit(width)))
      .select(col(idCol),
        col("_s.n_grams").as("n_grams"),
        col("_s.n_suspect").as("n_suspect"),
        when(col("_s.n_grams") === 0, lit(0.0))
          .otherwise(round(
            col("_s.n_suspect").cast("double") / col("_s.n_grams").cast("double"), 6))
          .as("suspicion"))
}
