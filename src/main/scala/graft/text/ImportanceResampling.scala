package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style importance resampling (Xie et al., "Data Selection for
  * Language Models via Importance Resampling", NeurIPS 2023): select
  * raw-corpus documents whose hashed-n-gram distribution looks like a
  * small TARGET corpus, by (1) fitting bag-of-hashed-ngram multinomials
  * on target and source, (2) scoring each raw document with the
  * log-importance weight  log w(x) = Σ_grams [log p_target(bucket) −
  * log p_source(bucket)],  and (3) resampling top-k under deterministic
  * Gumbel noise (Gumbel-top-k ≡ sampling without replacement ∝ w).
  *
  * Everything is engine-portable and oracle-replayable:
  *   - Features are unigrams + word bigrams hashed into a power-of-two
  *     bucket space via the repo hash `gmix64(fnv1a(gram))` — the same
  *     arithmetic the CMS sketch replays in DuckDB; the bucket mask is
  *     the unsigned-mod == AND trick CmsWidth uses.
  *   - Both multinomials use add-one smoothing over the FULL bucket
  *     space: log p(b) = ln((c_b + 1) / (N + B)), so unseen buckets are
  *     well-defined on both sides.
  *   - The per-document sum adds DECIMAL(18,12)-cast terms — exact and
  *     order-free under any partitioning (the UnigramLM trick), so the
  *     score is deterministic and SQL-replayable.
  *   - Gumbel noise is a pure function of (salt, doc id): the md5
  *     60-bit draw the deterministic samplers use, mapped through
  *     u = (draw + 0.5) / 2^60 (never 0 or 1), g = −ln(−ln(u)).
  *
  * Scale shape (the 100 TB story):
  *   - Each multinomial is ONE map-side-combined aggregate collapsing
  *     the corpus to ≤ B bucket rows (B = 8192 default) — the delta
  *     table `log p_t − log p_s` is a single ≤ B-row broadcast.
  *   - Scoring is: narrow gram projection → explode → broadcast join
  *     on bucket → one groupBy(doc) shuffle. No driver-side state, no
  *     vocabulary that grows with the corpus (hashing bounds it by
  *     construction — that is DSIR's point).
  *   - The resample is orderBy-limit-k = TakeOrderedAndProject:
  *     per-partition partial top-k, only k rows cross the wire.
  */
object ImportanceResampling {

  /** Default hashed-feature space size. Power of two so the unsigned
    * bucket mod is a bitmask on the Spark side and a HUGEINT `%` on
    * the oracle side (same rule as Sketches.CmsWidth). DSIR's paper
    * uses 10k buckets; 8192 is the nearest power of two. */
  val DefaultBuckets = 8192

  /** Raw (non-distinct — counts matter for a multinomial) unigram +
    * bigram list from a bound token-array column. This HOF form is the
    * SPEC REFERENCE; the pipelines route through the `graft_ngrams`
    * kernel (one loop per document, element-for-element ≡ this —
    * TextDedupSpec's fuzz property). Documents with fewer than 2
    * tokens simply contribute no bigrams. */
  def ngramsOf(toks: Column): Column = {
    val bigrams = when(
      size(toks) >= 2,
      transform(
        sequence(lit(1), size(toks) - 1),
        i => concat_ws(" ", slice(toks, i, lit(2)))),
    ).otherwise(array().cast("array<string>"))
    concat(toks, bigrams)
  }

  /** (doc id, bucket) gram instances — one row per gram OCCURRENCE
    * (multiset, not set). Bucket = gmix64(fnv1a(gram)) & (buckets−1).
    * explode_outer, not explode: InferFiltersFromGenerate would add a
    * size(_grams) > 0 pre-filter to a plain explode and the project
    * collapse then inlines the whole tokenize+ngram subtree into both
    * the filter and the generate (the tp6 lesson); the outer generate
    * skips the rule, and the empty-doc null rows die in the filter. */
  def gramBuckets(df: DataFrame, idCol: String, textCol: String, buckets: Int): DataFrame = {
    require(buckets > 0 && (buckets & (buckets - 1)) == 0, s"buckets must be a power of two: $buckets")
    df.withColumn("_grams",
        call_function("graft_ngrams", coalesce(col(textCol), lit(""))))
      .select(col(idCol), explode_outer(col("_grams")).as("_gram"))
      .filter(col("_gram").isNotNull)
      .select(
        col(idCol),
        call_function("graft_token_hash", col("_gram"))
          .bitwiseAND(lit((buckets - 1).toLong)).as("bucket"))
  }

  /** Corpus bucket counts: ≤ `buckets` rows however large the corpus
    * (map-side partial aggregation collapses each partition to ≤ B
    * rows before the shuffle). */
  def bucketCounts(df: DataFrame, textCol: String, buckets: Int = DefaultBuckets): DataFrame =
    gramBuckets(df.select(lit(1L).as("_one"), col(textCol)), "_one", textCol, buckets)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("c"))

  /** Per-document log importance weight of every `raw` document:
    * idCol, n_grams (int), logw (double, 6 dp; 0.0 for gram-less
    * docs). `target` is the small exemplar corpus (e.g. curated
    * English); `source` defaults to `raw` itself — DSIR's standard
    * setup where the raw crawl is its own source distribution. */
  def logWeights(
      raw: DataFrame,
      idCol: String,
      textCol: String,
      target: DataFrame,
      buckets: Int = DefaultBuckets,
  ): DataFrame = {
    // Cache the two bucket-sized (≤ B rows) count frames so the totals
    // derive from the SAME counting pass instead of re-scanning the
    // corpora: raw is scanned exactly twice (counts, scoring) and the
    // target once — the floor for a corpus-relative statistic (the
    // UnigramLM trick). Action-scoped: released at the caller's action.
    val tc = graft.quality.CacheScope.cachedUntilAction(
      bucketCounts(target, textCol, buckets).withColumnRenamed("c", "ct"))
    val sc = graft.quality.CacheScope.cachedUntilAction(
      bucketCounts(raw, textCol, buckets).withColumnRenamed("c", "cs"))
    val tn = tc.agg(sum(col("ct")).as("nt"))
    val sn = sc.agg(sum(col("cs")).as("ns"))
    val deltas = tc.join(sc, Seq("bucket"), "full_outer")
      .crossJoin(broadcast(tn)).crossJoin(broadcast(sn))
      .select(
        col("bucket"),
        (log((coalesce(col("ct"), lit(0L)) + 1).cast("double") / (col("nt") + buckets)) -
          log((coalesce(col("cs"), lit(0L)) + 1).cast("double") / (col("ns") + buckets)))
          .as("delta"))
    // Every gram of a raw doc is by construction present in the source
    // counts, so the broadcast join never misses: inner join is safe
    // and keeps the plan free of null handling in the hot path.
    val per = gramBuckets(raw, idCol, textCol, buckets)
      .join(broadcast(deltas), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).cast("int").as("n_grams"),
        sum(col("delta").cast("decimal(18,12)")).as("dsum"))
    raw.select(col(idCol))
      .join(per, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("n_grams"), lit(0)).as("n_grams"),
        when(col("n_grams").isNull, lit(0.0))
          .otherwise(round(col("dsum").cast("double"), 6))
          .as("logw"))
  }

  /** The frozen form of the delta table: one double per bucket,
    * indexed by bucket id — EXACTLY `buckets` entries (64 KB at the
    * default 8192), including the both-unseen smoothing floor for
    * buckets absent from both corpora. Driver state is bounded by B
    * by construction (the PQ-codebook / bloomMasks rule), never by
    * corpus size; the distributed part (two counting aggregates)
    * collapses to ≤ B rows before the collect. */
  def deltaArray(
      target: DataFrame,
      source: DataFrame,
      textCol: String,
      buckets: Int = DefaultBuckets,
  ): Array[Double] = {
    val tc = bucketCounts(target, textCol, buckets).withColumnRenamed("c", "ct")
    val sc = bucketCounts(source, textCol, buckets).withColumnRenamed("c", "cs")
    val tn = tc.agg(sum(col("ct")).as("nt"))
    val sn = sc.agg(sum(col("cs")).as("ns"))
    val rows = tc.join(sc, Seq("bucket"), "full_outer")
      .crossJoin(broadcast(tn)).crossJoin(broadcast(sn))
      .select(
        col("bucket"),
        (log((coalesce(col("ct"), lit(0L)) + 1).cast("double") / (col("nt") + buckets)) -
          log((coalesce(col("cs"), lit(0L)) + 1).cast("double") / (col("ns") + buckets)))
          .as("delta"),
        (log(lit(1.0) / (col("nt") + buckets)) - log(lit(1.0) / (col("ns") + buckets)))
          .as("floor"))
      .collect() // ≤ buckets rows — bounded by the parameter, not the data
    require(rows.nonEmpty, "deltaArray: both corpora are empty")
    val floor = rows.head.getDouble(2)
    val arr = Array.fill(buckets)(floor)
    rows.foreach(r => arr(r.getLong(0).toInt) = r.getDouble(1))
    arr
  }

  /** Admission-time scoring: the same per-document log weight as
    * [[logWeights]], computed as ONE NARROW PROJECTION — the frozen
    * [[deltaArray]] rides in the plan as a literal and the per-doc sum
    * is a higher-order aggregate over the gram array (DECIMAL
    * accumulator, so it equals the shuffled batch sum bit-for-bit:
    * decimal addition is exact and order-free). No explode, no join,
    * no shuffle, no state — the identical chain gates an unbounded
    * curation stream (the bloomSuspicionScores shape), priced at a
    * projection per document whatever the corpus size. Output schema
    * matches [[logWeights]]: idCol, n_grams, logw. */
  def admissionLogWeights(
      df: DataFrame,
      idCol: String,
      textCol: String,
      deltas: Array[Double],
      buckets: Int = DefaultBuckets,
  ): DataFrame = {
    require(deltas.length == buckets, s"deltaArray length ${deltas.length} != buckets $buckets")
    require(buckets > 0 && (buckets & (buckets - 1)) == 0, s"buckets must be a power of two: $buckets")
    // null text coalesces to the empty gram list inside the kernel
    // call, matching the batch path where the explode_outer null row
    // dies in the filter and the left join reports (0, 0.0).
    df.withColumn("_grams",
        call_function("graft_ngrams", coalesce(col(textCol), lit(""))))
      // ONE native kernel call per document (graft_dsir_score): hash +
      // exact pre-scaled decimal add per gram in a tight loop instead
      // of an interpreted per-gram HOF aggregate. The committed tp19
      // probe is delta-FIT-dominated (the fit is offline in the
      // streaming deployment); the scoring chain itself is the part
      // that rides the stream, and the kernel makes it one eval/doc.
      .withColumn("_s",
        call_function("graft_dsir_score", col("_grams"), lit(deltas), lit(buckets)))
      .select(
        col(idCol),
        col("_s.n_grams").as("n_grams"),
        when(col("_s.n_grams") === 0, lit(0.0))
          .otherwise(round(col("_s.dsum").cast("double"), 6))
          .as("logw"))
  }

  /** Gumbel-top-k resample: keep the k documents maximizing
    * logw + Gumbel(salt, id) — distributionally, sampling k without
    * replacement with probability ∝ exp(logw), but deterministic and
    * engine-portable because the "noise" is the md5 60-bit draw
    * (u = (draw + 0.5)/2^60, g = −ln(−ln(u))). Output: the input row
    * plus `gumbel_key` (6 dp), ordered nowhere — the SELECTION is the
    * contract, tie-broken by id. Plan: TakeOrderedAndProject (partial
    * per-partition top-k; only k rows shuffle). */
  def gumbelTopK(
      weighted: DataFrame,
      idCol: String,
      logwCol: String,
      k: Int,
      salt: String = "dsir",
  ): DataFrame = {
    val draw = conv(
      substring(md5(concat_ws(":", lit(salt), col(idCol).cast("string"))), 1, 15),
      16, 10).cast("long")
    val u = (draw.cast("double") + 0.5) / lit(math.pow(2, 60))
    val key = col(logwCol) + (-log(-log(u)))
    weighted
      .withColumn("gumbel_key", round(key, 6))
      .orderBy(col("gumbel_key").desc, col(idCol))
      .limit(k)
  }
}
