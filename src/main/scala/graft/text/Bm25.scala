package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Okapi BM25 sparse retrieval (Robertson & Zaragoza 2009, "The
  * Probabilistic Relevance Framework: BM25 and Beyond") — the lexical
  * complement of the dense ANN family in [[graft.sim.Similarity]]:
  * score(q, d) = Σ_{t ∈ q ∩ d} idf(t) · tf·(k1+1) / (tf + k1·(1 − b +
  * b·|d|/avgdl)), idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1).
  *
  * Scale design:
  *   - Inverted-index join: the distinct query terms (|Q| rows —
  *     tiny) BROADCAST against the corpus's (doc, term, tf) postings;
  *     the corpus never cross-joins the query set and only postings
  *     whose term appears in some query survive the join.
  *   - Corpus statistics are one aggregation each: doc lengths are a
  *     corpus-sized hash aggregate, N and avgdl a single tiny
  *     broadcast row, and term document-frequencies aggregate only
  *     the QUERY-term postings (df over pruned postings equals df
  *     over the corpus for every scorable term) — |Q| keys, not the
  *     billions-of-terms vocabulary.
  *   - Per-(query, doc) accumulation sums DECIMAL(18,12) term
  *     contributions — exact and order-free under any partitioning
  *     (the [[UnigramLM]] trick), so results are deterministic and
  *     SQL-replayable.
  *   - Top-k is a query-partitioned window, never a global sort.
  */
object Bm25 {

  /** Top-k BM25 retrieval. `queries` supplies (queryIdCol,
    * queryTextCol) rows; output is (queryIdCol, idCol, score, rank).
    * `excludeSelf` drops the query row itself when queries are drawn
    * from the corpus (the ANN-query convention). N and avgdl count
    * documents with at least one token.
    *
    * `maxDfFraction` < 1 is the hot-term scale guard: terms appearing
    * in more than that fraction of documents are pruned from scoring
    * entirely (classic stop-word elimination). Without it a query
    * containing "the" joins a posting for nearly EVERY document — the
    * one place this operator's cost degenerates from
    * |queries ∩ postings| to |corpus|. Such terms carry idf ≈ ln(1+ε)
    * anyway, so the ranking loss is tiny and bounded by the cap.
    *
    * TWO physical shapes, identical results (Bm25Spec pins them
    * decimal-exact; the selection rule lives next to the measured
    * negative result in PLANS.md t11):
    *
    *   - AGGREGATE-FIRST (default): the corpus collapses to (doc,
    *     term, tf) postings before anything touches the query set —
    *     map-side combine absorbs the token instances, robust to any
    *     query-vocabulary size. This form won at sf10 against the
    *     alternative by ~2× on a corpus-drawn query set.
    *   - INSTANCE-PRUNED: doc lengths come narrowly from
    *     `size(tokens)` and token INSTANCES broadcast-probe the query
    *     terms BEFORE the (doc, term) aggregate, eliminating the
    *     full-vocabulary shuffle. Wins only when |query vocab| ≪
    *     |corpus vocab| (point-query retrieval against a big corpus);
    *     on query sets whose vocabulary covers the corpus it pays a
    *     per-instance probe for nothing (the measured 87 → 180 s sf10
    *     regression that made aggregate-first the default).
    *
    * Selection: `forceInstancePruned` pins a shape; otherwise, when
    * `corpusVocabEstimate` is supplied (the KMV/HLL distinct-token
    * estimate from [[Sketches]] — a pipeline that maintains corpus
    * sketches gets this number for free), the pruned shape is chosen
    * iff |query vocab| · [[InstancePruneVocabFactor]] ≤ estimate. With
    * neither given, aggregate-first runs with zero extra actions. */
  val InstancePruneVocabFactor: Long = 50L

  /** The measured selection rule (PLANS.md t11 — conservative by
    * design: the sf10 negative result showed instance-pruning LOSES 2×
    * when the query vocabulary covers the corpus): prune instances iff
    * the query vocabulary is at least [[InstancePruneVocabFactor]]×
    * smaller than the corpus vocabulary. Callers get the estimate from
    * [[Sketches.kmvVocabEstimate]] (one bounded corpus pass) or, for
    * free, from accumulated streaming sketch state
    * ([[graft.streaming.StreamingIngest.vocabEstimateFromState]]). */
  def selectsInstancePruned(nQueryVocab: Long, corpusVocabEstimate: Long): Boolean =
    nQueryVocab * InstancePruneVocabFactor <= corpusVocabEstimate

  def bm25TopK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queries: DataFrame,
      queryIdCol: String,
      queryTextCol: String,
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75,
      excludeSelf: Boolean = false,
      maxDfFraction: Double = 1.0,
      corpusVocabEstimate: Option[Long] = None,
      forceInstancePruned: Option[Boolean] = None,
  ): DataFrame = {
    require(maxDfFraction > 0.0 && maxDfFraction <= 1.0,
      s"maxDfFraction must be in (0, 1], got $maxDfFraction")
    val qterms = queries.select(col(queryIdCol),
        explode(TextAnalysis.normalizedTokens(col(queryTextCol))).as("_t"))
      .distinct()
    val pruneInstances = forceInstancePruned.getOrElse(
      corpusVocabEstimate.exists { vocab =>
        // query frames are small by contract — this count is the only
        // extra action, and only when the caller opted into selection
        val nq = qterms.select(col("_t")).distinct().count()
        selectsInstancePruned(nq, vocab)
      })
    // Either shape yields the same three frames; everything downstream
    // (df, idf, decimal scoring, top-k) is shared verbatim.
    //   qpost: (idCol, _t, _tf) postings restricted to query terms
    //   dl:    (idCol, _dl) token count per doc with >= 1 token
    //   stats: one row (_n, _avgdl)
    val (qpost, dl, stats) =
      if (!pruneInstances) {
        val tok = docs.select(col(idCol),
          explode(TextAnalysis.normalizedTokens(col(textCol))).as("_t"))
        // One tokenization pass: every statistic derives from the
        // postings frame — doc length is the sum of its term counts,
        // df a count over postings — so the corpus is scanned once,
        // not three times. Cache the postings (vocab-per-doc-sized,
        // i.e. sub-linear in raw text), action-scoped: released when
        // the caller's query completes, so repeated calls in a
        // long-lived session never accumulate cached postings.
        val tf = graft.quality.CacheScope.cachedUntilAction(
          tok.groupBy(col(idCol), col("_t")).agg(count(lit(1)).as("_tf")))
        val dl = tf.groupBy(col(idCol)).agg(sum(col("_tf")).as("_dl"))
        val stats = dl.agg(count(lit(1)).as("_n"), avg(col("_dl")).as("_avgdl"))
        // Postings pruned to query terms BEFORE any per-term
        // statistic: df(t) over the pruned postings equals df(t) over
        // the corpus for every term that can reach a score (identical
        // results), and the document-frequency aggregate shrinks from
        // |vocab| — billions of terms on a web corpus — to |query
        // vocabulary|. Cached so the df aggregate and the scoring
        // chain share one probe pass.
        val qpost = graft.quality.CacheScope.cachedUntilAction(
          tf.join(broadcast(qterms.select(col("_t")).distinct()), Seq("_t")))
        (qpost, dl, stats)
      } else {
        val tokAll = docs.select(col(idCol),
          TextAnalysis.normalizedTokens(col(textCol)).as("_ts"))
        // narrow doc lengths: |tokens| == sum of term counts, no
        // full-vocabulary aggregate anywhere in this shape
        val dl = tokAll.select(col(idCol), size(col("_ts")).cast("long").as("_dl"))
          .filter(col("_dl") > 0)
        val stats = dl.agg(count(lit(1)).as("_n"), avg(col("_dl")).as("_avgdl"))
        val qpost = graft.quality.CacheScope.cachedUntilAction(
          tokAll.select(col(idCol), explode(col("_ts")).as("_t"))
            .join(broadcast(qterms.select(col("_t")).distinct()), Seq("_t"))
            .groupBy(col(idCol), col("_t")).agg(count(lit(1)).as("_tf")))
        (qpost, dl, stats)
      }
    val dfreqAll = qpost.groupBy(col("_t")).agg(count(lit(1)).as("_df"))
    val dfreq =
      if (maxDfFraction < 1.0)
        // inner joins downstream drop the pruned terms' postings
        dfreqAll.crossJoin(broadcast(stats))
          .filter(col("_df") <= col("_n") * maxDfFraction)
          .select(col("_t"), col("_df"))
      else dfreqAll
    val joined = qpost
      .join(broadcast(qterms), Seq("_t"))
      .join(dfreq, Seq("_t"))
      .join(dl, Seq(idCol))
      .crossJoin(broadcast(stats))
    val filtered =
      if (excludeSelf) joined.filter(col(queryIdCol) =!= col(idCol)) else joined
    val contrib = filtered
      .withColumn("_idf",
        log((col("_n") - col("_df") + 0.5) / (col("_df") + 0.5) + 1.0))
      .withColumn("_c",
        (col("_idf") * (col("_tf") * (k1 + 1.0)) /
          (col("_tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("_dl") / col("_avgdl"))))
          .cast("decimal(18,12)"))
    contrib
      .groupBy(col(queryIdCol), col(idCol))
      .agg(sum(col("_c")).as("_s"))
      .withColumn("score", round(col("_s").cast("double"), 6))
      .withColumn("rank",
        row_number().over(
          Window.partitionBy(col(queryIdCol)).orderBy(col("score").desc, col(idCol))))
      .filter(col("rank") <= k)
      .select(col(queryIdCol), col(idCol), col("score"), col("rank").cast("int").as("rank"))
  }
}
