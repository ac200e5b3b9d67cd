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
        // One tokenization pass, MAP-SIDE term counting: term
        // frequencies are a per-document statistic, so the old
        // explode → groupBy(doc, token) idiom's full-VOCABULARY
        // exchange (the largest shuffle of the indexing path at any
        // scale) is not fundamental — the graft_token_tf kernel folds
        // each document's token stream through one hash map inside
        // the row, and doc lengths fold narrowly from the same array
        // (Σ tf ≡ token count). Cache the per-doc arrays
        // (vocab-per-doc-sized, i.e. sub-linear in raw text),
        // action-scoped: the postings explode and the length fold are
        // two consumers of one tokenization, and repeated calls in a
        // long-lived session accumulate nothing.
        // The repartition replaces the old shape's full-vocabulary
        // aggregate exchange with a strictly smaller one — per-doc
        // PACKED arrays (the id once per document, no per-(doc,term)
        // row overhead) instead of flat (doc, term, tf) rows — and
        // hash-partitions the postings by id, so the dl join below is
        // exchange-free and the scoring fan-out inherits real
        // parallelism even when the scan is a single split (small
        // corpora are one parquet row group; at scale the scan has
        // natural splits and this exchange is the indexing pass's
        // only one).
        val tfs = graft.quality.CacheScope.cachedUntilAction(
          docs.select(col(idCol),
            call_function("graft_token_tf", col(textCol)).as("_tfs"))
            .repartition(col(idCol)))
        val tf = tfs
          .select(col(idCol), explode(col("_tfs")).as("_e"))
          .select(col(idCol), col("_e.t").as("_t"), col("_e.tf").as("_tf"))
        val dl = tfs
          .select(col(idCol),
            aggregate(col("_tfs"), lit(0L), (a, x) => a + x.getField("tf")).as("_dl"))
          .filter(col("_dl") > 0)
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
