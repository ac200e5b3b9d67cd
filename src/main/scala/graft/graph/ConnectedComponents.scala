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
  * Algorithm: min-label propagation to fixpoint as a DELTA iteration —
  * label(v) starts as v and becomes the min over v and its neighbors'
  * labels; at fixpoint every vertex carries the minimum vertex id of
  * its component (deterministic, so the output is oracle-checkable:
  * DuckDB replays it as a recursive-CTE label closure over the same
  * pairs). Labels only ever decrease, so a vertex whose label did NOT
  * change in round r has nothing new to tell its neighbors in round
  * r+1 — each round therefore aggregates only over edges incident to
  * the previous round's CHANGED vertices (the frontier), the classic
  * semi-naive / delta-iteration evaluation.
  *
  * Scale shape (100 TB):
  *   - Round 1 is ONE aggregate over the symmetric edge set (the
  *     groupBy keys ARE the vertex set, so the initial labeling and
  *     the first propagation fuse into a single min() pass — bounded
  *     buffer, map-side combine, flat at any degree skew).
  *   - Rounds 2+ touch only frontier-incident edges. LSH near-dup
  *     graphs are star-dominated (rep→member pairs from the
  *     oversized-bucket path; dense blobs from the all-pairs path),
  *     so the frontier collapses after round 1 and later rounds cost
  *     ~nothing even though the worst-case round count is still the
  *     graph diameter. `maxIters` bounds the loop; non-convergence
  *     THROWS rather than returning silently wrong labels (no-silent-
  *     caps principle).
  *   - The edge set is hash-partitioned by src ONCE and materialized
  *     (eager localCheckpoint): every round's frontier join and the
  *     round-1 aggregate reuse that layout instead of re-shuffling
  *     the edges each round — per-round shuffle volume is the
  *     frontier, not the graph. Label updates join the full label
  *     frame with the (small) improvement frame, which Spark
  *     broadcasts off the checkpoint-known size.
  *   - Lineage is truncated per round with an eager localCheckpoint —
  *     diameter-many rounds of self-joins would otherwise stack into
  *     one unplannable tree. On a cluster with a checkpoint dir,
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
    // symmetrize: propagation must travel both directions. Partition by
    // src and materialize once: every round joins this frame on src,
    // and without the checkpoint each round would recompute the
    // caller's entire pair-generation pipeline (an LSH near-dup
    // cascade, typically).
    val sym = edges
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .repartition(col("src"))
      .localCheckpoint(true)
    // Round 1, fused: sym is symmetric, so groupBy(src) keys are
    // exactly the vertex set — initial labeling and first propagation
    // are one shuffle-free aggregate over the pre-partitioned edges.
    var labels = sym
      .groupBy(col("src").as("id"))
      .agg(min(col("dst")).as("_nbr"))
      .select(col("id"), least(col("id"), col("_nbr")).as("component"))
      .localCheckpoint(true)
    var frontier = labels.filter(col("component") =!= col("id"))
    var round = 1
    var converged = frontier.isEmpty // only true for an empty graph
    while (!converged && round < maxIters) {
      // neighbor minimum per vertex, from frontier-incident edges only:
      // bounded aggregation buffer, map-side combinable — flat under
      // hub skew; volume ∝ frontier degree sum, not graph size
      val nbrMin = sym
        .join(frontier.withColumnRenamed("id", "src"), Seq("src"))
        .groupBy(col("dst").as("id"))
        .agg(min(col("component")).as("_nbr"))
      val improved = labels
        .join(nbrMin, Seq("id"))
        .filter(col("_nbr") < col("component"))
        .select(col("id"), col("_nbr").as("component"))
        .localCheckpoint(true)
      round += 1
      if (improved.isEmpty) converged = true
      else {
        labels = labels
          .join(improved.withColumnRenamed("component", "_new"), Seq("id"), "left")
          .select(col("id"), coalesce(col("_new"), col("component")).as("component"))
          .localCheckpoint(true)
        frontier = improved
      }
    }
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIters rounds — the pair " +
          "graph has a longer path than expected (min-label propagation needs " +
          "diameter-many rounds); raise maxIters for this graph")
    labels
  }
}
