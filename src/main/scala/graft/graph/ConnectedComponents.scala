package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected pair graph — the step
  * between near-duplicate PAIR emission (TextDedup / Similarity) and
  * corpus-level decisions: a duplicate CLUSTER id per document lets a
  * curation pipeline keep exactly one member per cluster, size-stratify
  * clusters, or audit what the pairwise threshold actually groups.
  * (The reference pipeline stops at row-level dedup; this is part of
  * the beyond-reference LLM-curation family.)
  *
  * Algorithm: iterative min-label propagation to fixpoint — label(v)
  * starts as v and each round becomes the min over v and its
  * neighbors' labels; at fixpoint every vertex carries the minimum
  * vertex id of its component (deterministic, so the output is
  * oracle-checkable: DuckDB replays it as a recursive-CTE label
  * closure over the same pairs).
  *
  * Scale shape (100 TB):
  *   - Each round is ONE aggregate (neighbor min per dst — count/min
  *     buffer, map-side combine, flat at any degree skew: a hub
  *     vertex's incoming labels combine to one row per mapper) and
  *     one join back to the labels frame. No collected adjacency
  *     lists anywhere.
  *   - Rounds needed = graph diameter. LSH near-dup graphs are
  *     star-dominated (rep→member pairs from the oversized-bucket
  *     path; dense blobs from the all-pairs path), so diameter — and
  *     the round count — is small in practice. `maxIters` bounds the
  *     loop; non-convergence THROWS rather than returning silently
  *     wrong labels (no-silent-caps principle).
  *   - Lineage is truncated per round with an eager localCheckpoint —
  *     20 rounds of self-joins would otherwise stack into one
  *     unplannable tree. On a cluster with a checkpoint dir,
  *     `spark.sparkContext.setCheckpointDir` + reliable checkpoints
  *     are the durable variant of the same move.
  */
object ConnectedComponents {

  /** (id, component) for every vertex that appears in `pairs`;
    * `component` is the minimum vertex id of the connected component.
    * Vertices not present in any pair are absent — left-join and
    * coalesce to the vertex's own id for singleton semantics. */
  def components(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      maxIters: Int = 20,
  ): DataFrame = {
    require(maxIters >= 1, s"maxIters must be >= 1, got $maxIters")
    val edges = pairs
      .filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .select(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst"))
    // symmetrize: propagation must travel both directions. Materialize
    // once (eager localCheckpoint): every round joins this frame, and
    // without it each round would recompute the caller's entire
    // pair-generation pipeline (an LSH near-dup cascade, typically).
    val sym = edges
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint(true)
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("component", col("id"))
      .localCheckpoint(true)
    var round = 0
    var converged = false
    while (!converged && round < maxIters) {
      // neighbor minimum per vertex: bounded aggregation buffer,
      // map-side combinable — flat under hub skew
      val nbrMin = sym
        .join(labels.withColumnRenamed("id", "src"), Seq("src"))
        .groupBy(col("dst").as("id"))
        .agg(min(col("component")).as("_nbr"))
      // the convergence flag rides the checkpointed frame, so the
      // changed? probe below reads materialized rows instead of
      // re-running the round's join
      val next = labels
        .join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("component"), coalesce(col("_nbr"), col("component")))
            .as("component"),
          (coalesce(col("_nbr"), col("component")) < col("component")).as("_changed"))
        .localCheckpoint(true)
      val changed = next.filter(col("_changed")).limit(1).count()
      labels = next.drop("_changed")
      converged = changed == 0L
      round += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIters rounds — the pair " +
          "graph has a longer path than expected (min-label propagation needs " +
          "diameter-many rounds); raise maxIters for this graph")
    labels
  }
}
