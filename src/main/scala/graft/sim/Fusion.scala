package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion (Cormack, Clarke & Büttcher 2009, "Reciprocal
  * rank fusion outperforms Condorcet and individual rank learning
  * methods"): combine rankings from heterogeneous retrievers — e.g.
  * BM25 lexical and dense cosine — without score calibration:
  * RRF(q, d) = Σ_r 1/(c + rank_r(q, d)) over the rankings r that
  * retrieved d for q. Ranks are comparable across retrievers where raw
  * scores are not, which is why this is the standard hybrid-retrieval
  * combiner.
  *
  * Scale shape: the inputs are already top-k-bounded per query
  * (|queries| × k rows each), so fusion never touches the corpus — a
  * unionByName of tiny frames, one hash aggregate on (query, doc),
  * and a query-partitioned top-k window. Contributions sum as
  * DECIMAL(18,12): exact, order-free, SQL-replayable.
  */
object Fusion {

  /** Fuse per-query rankings. Each input must carry `queryIdCol`,
    * `idCol`, and an integer `rank` column (1-based, as produced by
    * the top-k operators here). Output: queryIdCol, idCol, rrf_score
    * (6 dp), sources (how many rankings retrieved the doc), rank. */
  def rrfFuse(
      rankings: Seq[DataFrame],
      queryIdCol: String,
      idCol: String,
      k: Int,
      c: Int = 60,
  ): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking to fuse")
    require(c >= 0, s"rank constant must be >= 0, got $c")
    val u = rankings
      .map(_.select(col(queryIdCol), col(idCol), col("rank")))
      .reduce(_.unionByName(_))
    u.withColumn("_rr", (lit(1.0) / (lit(c) + col("rank"))).cast("decimal(18,12)"))
      .groupBy(col(queryIdCol), col(idCol))
      .agg(sum(col("_rr")).as("_s"), count(lit(1)).cast("int").as("sources"))
      .withColumn("rrf_score", round(col("_s").cast("double"), 6))
      .withColumn("rank",
        row_number().over(
          Window.partitionBy(col(queryIdCol)).orderBy(col("rrf_score").desc, col(idCol))))
      .filter(col("rank") <= k)
      .select(col(queryIdCol), col(idCol), col("rrf_score"), col("sources"),
        col("rank").cast("int").as("rank"))
  }
}
