package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Line-level (paragraph-level) deduplication: remove individual lines
  * that recur across many documents — boilerplate headers, navigation
  * chrome, cookie banners, licence footers — while keeping each
  * document's unique body. This is the CCNet-style pass (Wenzek et al.
  * 2020, "CCNet: Extracting High Quality Monolingual Datasets from Web
  * Crawl Data") that document-level dedup cannot express: two documents
  * can be globally unique yet share 80% boilerplate lines.
  *
  * Scale design (the 100 TB shape):
  *   - One shuffle computes per-line document frequency (hash
  *     aggregation with map-side partial counts — line text is the
  *     grouping key, so identical boilerplate combines locally before
  *     the exchange).
  *   - The frequent-line set is small at any realistic threshold (only
  *     lines with doc_freq > threshold — heavy hitters), so the removal
  *     join is normally a BROADCAST left-anti join: the corpus's
  *     exploded lines never re-shuffle on line text. But the set's size
  *     is DATA-DEPENDENT — on a 100 TB web corpus the CCNet
  *     heavy-hitter set is realistically tens of millions of lines, and
  *     a forced hint never falls back: it rides to Spark's 8 GB /
  *     512M-row broadcast hard limit and OOMs the driver. So the hint
  *     is SIZE-GATED (the [[graft.sink.IdempotentAppend.BroadcastPruneMaxKeys]]
  *     house pattern): the frequent set is counted first — it is cached
  *     across the count and the removal join, so the aggregate runs
  *     once — and above [[BroadcastFrequentMaxLines]] the hint is
  *     dropped, falling back to a shuffled left-anti join on line text
  *     (LineDedupSpec proves both paths row-identical on either side of
  *     the bound).
  *   - Reassembly groups by doc id — the second and last shuffle —
  *     and restores line order with an array_sort over (line_no, line)
  *     structs, never a window.
  */
object LineDedup {

  /** Frequent sets at or under this many lines take the broadcast
    * anti-join path in [[removeFrequentLines]] (heavy-hitter lines are
    * boilerplate — typically short, so ~1M lines is tens-to-hundreds
    * of MB broadcast); larger sets fall back to a shuffled left-anti
    * join on line text. Same bound philosophy as
    * [[graft.sink.IdempotentAppend.BroadcastPruneMaxKeys]]. */
  val BroadcastFrequentMaxLines: Long = 1000000L

  /** Document frequency per distinct line (how many distinct docs
    * contain the line at least once). */
  def lineDocFrequency(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), explode_outer(split(col(textCol), "\n")).as("line"))
      .groupBy(col("line"))
      .agg(countDistinct(col(idCol)).as("doc_freq"))

  /** Remove every line whose document frequency exceeds `maxDocFreq`,
    * preserving the original order of surviving lines. Every input
    * document is retained (a fully-boilerplate doc comes back with
    * `n_lines_kept = 0` and empty `clean_text`) so downstream stages
    * can decide whether to drop empties — removal and document
    * filtering are separate policies.
    *
    * NOT construction-lazy since the r13 gate: sizing the broadcast
    * hint runs one EAGER Spark job (the frequent-set count — a full
    * line-frequency aggregation, cached and shared with the returned
    * plan) at call time; callers that only build or inspect the plan
    * still pay it.
    *
    * Output: idCol, n_lines_kept (int), clean_text (string).
    */
  def removeFrequentLines(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxDocFreq: Long,
      broadcastMaxLines: Long = BroadcastFrequentMaxLines,
  ): DataFrame = {
    // explode_outer, not explode: InferFiltersFromGenerate would add a
    // size()>0 pre-filter to a plain explode and inline the split back
    // into it (see the tp6 gotcha); outer generates are skipped by the
    // rule, and a null/empty doc must survive to the final left join
    // anyway.
    val lines = df.select(
      col(idCol),
      posexplode_outer(split(col(textCol), "\n")).as(Seq("line_no", "line")))
    // the removal threshold comes from the SAME statistic the public
    // helper exports — one definition of line document-frequency
    val frequentRaw = lineDocFrequency(df, idCol, textCol)
      .filter(col("doc_freq") > maxDocFreq)
      .select(col("line"))
    // Size-gate the broadcast hint: count the frequent set (it is an
    // aggregate output — cached, so the count and the anti-join below
    // share one aggregation pass; the release listener is registered
    // BEFORE the count and skips that first consumption, so the cache
    // deterministically survives until the caller's action) and only
    // hint below the bound. Above it, no hint: the anti-join shuffles
    // both sides on line text — slower, but never a driver OOM on a
    // boilerplate-heavy corpus.
    val (frequent, owned) = graft.quality.CacheScope.acquire(frequentRaw)
    if (owned) graft.quality.CacheScope.retainAcrossOwnAction(frequent)
    val nFrequent = frequent.count()
    val removeSide =
      if (nFrequent <= broadcastMaxLines) broadcast(frequent) else frequent
    // the (null, null) row posexplode_outer emits for a null/absent
    // text must not count as a kept line
    val kept = lines
      .filter(col("line").isNotNull)
      .join(removeSide, Seq("line"), "left_anti")
    val rebuilt = kept
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).cast("int").as("n_lines_kept"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("line_no").as("n"), col("line").as("l")))),
            e => e.getField("l")),
          "\n").as("clean_text"))
    df.select(col(idCol))
      .join(rebuilt, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("n_lines_kept"), lit(0)).as("n_lines_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }
}
