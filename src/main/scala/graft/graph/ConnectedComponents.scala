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
  *   - HIGH-DIAMETER graphs (transitive near-dup CHAINS under a loose
  *     threshold — exactly how web-corpus dup graphs grow long paths)
  *     would need diameter-many propagation rounds; instead, if the
  *     frontier has not emptied after a few rounds, the loop escalates
  *     to alternating large-star/small-star contraction (Kiveris,
  *     Lattanzi, Mirrokni, Rastogi, Vassilvitskii, "Connected
  *     Components in MapReduce and Beyond", SoCC 2014), which
  *     converges in O(log n) rounds REGARDLESS of diameter. Both
  *     paths produce the identical deterministic labeling (component
  *     = min vertex id), so escalation never changes the answer —
  *     only the round count. `maxIters` bounds the star rounds; at
  *     the default 20 that covers graphs of diameter far beyond any
  *     real corpus (2^20-link chains), and non-convergence still
  *     THROWS rather than returning silently wrong labels.
  */
object ConnectedComponents {

  /** Frontier-propagation rounds (cheap, reuses the src-partitioned
    * edges) before escalating to star contraction: star-dominated LSH
    * graphs empty their frontier by round 2-3; anything still moving
    * after that is diameter-shaped and propagation is the wrong tool. */
  private val EscalateAfter = 3

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
    while (!converged && round < math.min(EscalateAfter, maxIters)) {
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
    if (converged) labels
    else {
      // observable escalation (no-silent-behavior): a diameter-shaped
      // graph is a data-shape fact the operator's user wants to know
      System.err.println(
        s"[graft.cc] frontier still moving after $round propagation rounds — " +
          "escalating to large-star/small-star contraction (O(log n) rounds)")
      val (starLabels, starRounds) = starComponents(sym, maxIters)
      System.err.println(s"[graft.cc] star contraction converged in $starRounds rounds")
      starLabels
    }
  }

  /** Alternating large-star/small-star contraction over the edge set
    * (Kiveris et al. 2014) — O(log n) rounds at any diameter. Returns
    * (labels, roundsUsed); ConnectedComponentsSpec pins the round
    * bound on a 1000-vertex path graph.
    *
    * Representation: canonical undirected edges (hi, lo), hi > lo,
    * distinct. Per round:
    *   - large-star: for every directed (u,v) with v > u, emit
    *     (v, m(u)) where m(u) = min(N(u) ∪ {u}) — strictly-larger
    *     neighbors re-attach to the local minimum;
    *   - small-star: on the result, for every center hi with
    *     neighbors lo < hi, emit (lo', m) for lo' ≠ m and (hi, m)
    *     where m = min neighbor — not-larger neighbors re-attach.
    * Each op preserves connectivity; the edge set monotonically
    * contracts toward stars centered at component minima. Convergence
    * is detected by a (count, hash-XOR) checksum going stable — two
    * scalar aggregates per round, no driver-side edge collection —
    * and then CONFIRMED exactly by a left_anti join (equal counts +
    * empty difference ⇒ set equality), so a checksum collision can
    * delay detection by a round but can never accept a non-fixpoint.
    * XOR is order-free and cannot overflow, so the check is
    * ANSI-mode-safe (the previous wrap-around sum was not).
    *
    * Scale shape: every step is groupBy/join on vertex keys —
    * map-side-combinable aggregates and hash joins, no windows, no
    * driver loops proportional to diameter. Per-round volume is the
    * current edge set, which only shrinks; lineage is truncated per
    * round with an eager localCheckpoint, exactly like the
    * propagation path. */
  private[graph] def starComponents(
      sym: DataFrame,
      maxIters: Int,
  ): (DataFrame, Int) = {
    var c = sym.filter(col("src") =!= col("dst"))
      .select(greatest(col("src"), col("dst")).as("hi"),
        least(col("src"), col("dst")).as("lo"))
      .distinct()
      .localCheckpoint(true)
    // (edge count, XOR of per-edge 64-bit hashes): a cheap per-round
    // fingerprint — equality is NECESSARY for a fixpoint but confirmed
    // exactly below before the loop exits. XOR (vs sum) is exact under
    // ANSI mode too: it cannot overflow. The frame is distinct(), so
    // XOR's duplicate-cancellation property is irrelevant here.
    def checksum(df: DataFrame): (Long, Long) = {
      val r = df.agg(
        count(lit(1)),
        coalesce(expr("bit_xor(xxhash64(hi, lo))"), lit(0L))).head
      (r.getLong(0), r.getLong(1))
    }
    var prev = checksum(c)
    var rounds = 0
    var done = prev._1 == 0L // edgeless input: nothing to contract
    while (!done && rounds < maxIters) {
      val s = c.select(col("hi").as("src"), col("lo").as("dst"))
        .unionByName(c.select(col("lo").as("src"), col("hi").as("dst")))
      val m = s.groupBy("src").agg(least(col("src"), min(col("dst"))).as("m"))
      // large-star; output is canonical by construction (dst > src ≥ m)
      val ls = s.filter(col("dst") > col("src"))
        .join(m, Seq("src"))
        .select(col("dst").as("hi"), col("m").as("lo"))
        .filter(col("hi") =!= col("lo"))
        .distinct()
      // small-star on the canonical frame: every lo-neighbor of hi
      // (and hi itself) re-attaches to the minimum neighbor
      val m2 = ls.groupBy("hi").agg(min(col("lo")).as("m"))
      val ss = ls.join(m2, Seq("hi"))
        .filter(col("lo") =!= col("m"))
        .select(col("lo").as("hi"), col("m").as("lo"))
        .unionByName(m2.select(col("hi"), col("m").as("lo")))
        .distinct()
        .localCheckpoint(true)
      rounds += 1
      val cur = checksum(ss)
      // Exact confirmation on checksum match: counts are equal (part of
      // cur == prev), so an empty c∖ss difference ⇒ the sets are equal.
      // Runs once at convergence (collisions aside), on two checkpointed
      // star-forest-sized frames — a collision can only force one extra
      // round, never a wrong early exit.
      done = cur == prev &&
        c.join(ss, Seq("hi", "lo"), "left_anti").isEmpty
      prev = cur
      c = ss
    }
    if (!done)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIters star-contraction " +
          "rounds — alternation converges in O(log n) rounds, so this graph is " +
          "far larger than the bound anticipates; raise maxIters")
    // At fixpoint c is a disjoint star forest (child hi → center lo =
    // component min). Recover singletons (self-pair-only vertices lose
    // their edges to the self-loop filter) from the full vertex set.
    val verts = sym.select(col("src").as("id")).distinct()
    val labels = verts
      .join(c.select(col("hi").as("id"), col("lo").as("_comp")), Seq("id"), "left")
      .select(col("id"), coalesce(col("_comp"), col("id")).as("component"))
    (labels, rounds)
  }
}
