package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "apple banana apple"),
    (2L, "banana cherry"),
    (3L, "cherry date cherry date"),
  ).toDF("doc_id", "text")

  // the closed form the operator must reproduce (N=3, avgdl=3.0)
  private def idf(df: Int, n: Int) = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
  private def term(tf: Int, dfq: Int, dl: Int, n: Int, avgdl: Double) =
    idf(dfq, n) * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))

  test("bm25TopK matches the closed-form score on a hand fixture, ranks correctly") {
    val q = Seq((100L, "apple cherry")).toDF("query_id", "qtext")
    val out = Bm25.bm25TopK(docs, "doc_id", "text", q, "query_id", "qtext", k = 3)
      .orderBy("rank").collect()
    // d1: apple tf=2 df=1 dl=3; d3: cherry tf=2 df=2 dl=4; d2: cherry tf=1 df=2 dl=2
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 3L, 2L))
    assert(out.map(_.getInt(3)).toSeq == Seq(1, 2, 3))
    val got = out.map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(math.abs(got(1L) - term(2, 1, 3, 3, 3.0)) < 1e-6)
    assert(math.abs(got(3L) - term(2, 2, 4, 3, 3.0)) < 1e-6)
    assert(math.abs(got(2L) - term(1, 2, 2, 3, 3.0)) < 1e-6)
  }

  test("k truncates, excludeSelf drops the query doc, disjoint query yields nothing") {
    val self = Seq((1L, "apple banana apple")).toDF("query_id", "qtext") // = doc 1
    val incl = Bm25.bm25TopK(docs, "doc_id", "text", self, "query_id", "qtext", k = 10)
      .select("doc_id").as[Long].collect().toSet
    assert(incl.contains(1L)) // self-match ranks
    val excl = Bm25.bm25TopK(docs, "doc_id", "text", self, "query_id", "qtext", k = 10,
      excludeSelf = true).select("doc_id").as[Long].collect().toSet
    assert(excl == Set(2L)) // apple only in d1 (excluded); banana hits d2
    assert(Bm25.bm25TopK(docs, "doc_id", "text",
      Seq((5L, "zzz")).toDF("query_id", "qtext"), "query_id", "qtext", k = 3).isEmpty)
    assert(Bm25.bm25TopK(docs, "doc_id", "text",
      Seq((100L, "apple cherry")).toDF("query_id", "qtext"), "query_id", "qtext",
      k = 1).count() == 1)
  }

  test("maxDfFraction prunes hot terms: scoring equals the closed form without them") {
    val hot = Seq(
      (1L, "the apple the"),
      (2L, "the banana"),
      (3L, "the cherry"),
    ).toDF("doc_id", "text") // "the" in every doc (df = 3 = N)
    val q = Seq((100L, "the apple")).toDF("query_id", "qtext")
    val pruned = Bm25.bm25TopK(hot, "doc_id", "text", q, "query_id", "qtext",
      k = 3, maxDfFraction = 0.5).collect()
    // "the" (df/N = 1 > 0.5) contributes nothing: only d1 matches, on
    // apple alone (tf=1 df=1 dl=3, avgdl = 7/3)
    assert(pruned.map(_.getLong(1)).toSeq == Seq(1L))
    assert(math.abs(pruned.head.getDouble(2) - term(1, 1, 3, 3, 7.0 / 3.0)) < 1e-6)
    // without the cap, "the" scores every document
    val full = Bm25.bm25TopK(hot, "doc_id", "text", q, "query_id", "qtext", k = 3)
    assert(full.count() == 3)
  }

  test("multi-term scores are the sum of per-term contributions") {
    val q = Seq((100L, "banana cherry")).toDF("query_id", "qtext")
    val got = Bm25.bm25TopK(docs, "doc_id", "text", q, "query_id", "qtext", k = 3)
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    // d2 matches both banana (tf=1 df=2 dl=2) and cherry (tf=1 df=2 dl=2)
    val d2 = term(1, 2, 2, 3, 3.0) + term(1, 2, 2, 3, 3.0)
    assert(math.abs(got(2L) - d2) < 1e-6)
  }

  test("instance-pruned shape agrees with aggregate-first decimal-exactly; estimate-driven selection") {
    // richer fixture: repeated terms, a doc outside the query vocab,
    // multi-query set with self-exclusion
    val corpus = (docs.collect().map(r => (r.getLong(0), r.getString(1))).toSeq ++ Seq(
      (4L, "elderberry fig grape grape grape"),
      (5L, "apple date apple date fig"),
    )).toDF("doc_id", "text")
    val q = Seq((100L, "apple cherry"), (4L, "grape fig")).toDF("query_id", "qtext")
    def run(force: Option[Boolean]) = Bm25
      .bm25TopK(corpus, "doc_id", "text", q, "query_id", "qtext", k = 5,
        excludeSelf = true, forceInstancePruned = force)
      .orderBy("query_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
    val aggFirst = run(Some(false))
    val pruned = run(Some(true))
    assert(pruned == aggFirst) // same rows, same scores to the decimal, same ranks
    // estimate-driven selection matches the forced shapes on both sides
    // of the threshold (|query vocab| = 4 here): a huge corpus-vocab
    // estimate selects the pruned shape, a small one aggregate-first
    def runEst(v: Long) = Bm25
      .bm25TopK(corpus, "doc_id", "text", q, "query_id", "qtext", k = 5,
        excludeSelf = true, corpusVocabEstimate = Some(v))
      .orderBy("query_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
    assert(runEst(4L * Bm25.InstancePruneVocabFactor) == aggFirst)
    assert(runEst(1000000L) == aggFirst)
  }

  test("auto-selection end-to-end: the engine's own KMV estimate drives the shape") {
    // 300 docs × 8 unique tokens each → true vocab 2400; the KMV
    // estimate (k=256, rel err ~1/√k ≈ 6%) must land near it.
    val big = spark.range(300).select(col("id").as("doc_id"),
      concat_ws(" ", (0 until 8).map(j =>
        concat(lit("tok"), (col("id") * 8 + j).cast("string"))): _*).as("text"))
    val est = Sketches.kmvVocabEstimate(big, "text")
    // the driver-side formula must agree EXACTLY with the engine-side
    // oracle-checked computation (t17's est_distinct column) — that is
    // the property that makes the helper trustworthy; accuracy itself
    // is the sketch's (a loose sanity band suffices for the ×50 rule)
    val engineSide = Sketches.kmvDistinct(big, "text", k = 256)
      .collect().head.getLong(2)
    assert(est === engineSide)
    assert(est > 1200 && est < 4800, s"KMV estimate far off true vocab 2400: $est")
    // a corpus smaller than k is estimated EXACTLY (sketch = the set)
    assert(Sketches.kmvVocabEstimate(docs, "text") === 4L)

    // point query (2 terms): 2×50 ≤ est → the pruned shape is selected
    assert(Bm25.selectsInstancePruned(2L, est))
    // a corpus-covering query set flips back to aggregate-first
    assert(!Bm25.selectsInstancePruned(est / 10, est))

    val q = Seq((0L, "tok8 tok9")).toDF("query_id", "qtext")
    def run(force: Option[Boolean], estimate: Option[Long]) = Bm25
      .bm25TopK(big, "doc_id", "text", q, "query_id", "qtext", k = 5,
        corpusVocabEstimate = estimate, forceInstancePruned = force)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val auto = run(None, Some(est))
    assert(auto.nonEmpty)
    assert(auto == run(Some(true), None) && auto == run(Some(false), None))
  }
}
