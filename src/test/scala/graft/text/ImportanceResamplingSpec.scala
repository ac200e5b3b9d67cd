package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ImportanceResamplingSpec extends SparkSpec {
  import spark.implicits._

  // A corpus with two clearly separated token distributions: "target-
  // looking" docs share the wiki vocabulary, off-target docs share the
  // spam vocabulary. One empty and one single-token doc pin the edges.
  private val docs = Seq(
    (1L, "the cat sat on the mat and the dog slept", "en"),
    (2L, "the dog sat on the mat and the cat slept", "en"),
    (3L, "a cat and a dog sat on a mat", "en"),
    (4L, "buy cheap pills now click here buy now", "xx"),
    (5L, "click here now cheap pills buy here now", "xx"),
    (6L, "", "xx"),
    (7L, "cat", "xx"),
  ).toDF("doc_id", "text", "lang")

  private val target = docs.filter(col("lang") === "en")

  test("ngramsOf: unigrams plus adjacent bigrams, multiset semantics; short docs safe") {
    val out = docs
      .withColumn("_toks", TextAnalysis.tokens(TextAnalysis.normalized(col("text"))))
      .select(col("doc_id"), ImportanceResampling.ngramsOf(col("_toks")).as("g"))
      .as[(Long, Seq[String])].collect().toMap
    assert(out(3L) == Seq(
      "a", "cat", "and", "a", "dog", "sat", "on", "a", "mat",
      "a cat", "cat and", "and a", "a dog", "dog sat", "sat on", "on a", "a mat"))
    assert(out(6L).isEmpty) // empty doc → no grams
    assert(out(7L) == Seq("cat")) // 1 token → no bigrams, no stray grams
    // Multiset: doc 1 has "the" three times — all occurrences kept.
    assert(out(1L).count(_ == "the") == 3)
  }

  test("logWeights: on-target docs score above off-target; empty doc is (0, 0.0)") {
    val w = ImportanceResampling.logWeights(docs, "doc_id", "text", target, buckets = 256)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2)))).toMap
    assert(w.size == 7)
    val (onT, offT) = (Seq(1L, 2L, 3L).map(w(_)._2), Seq(4L, 5L).map(w(_)._2))
    assert(onT.min > offT.max,
      s"target-like docs must outweigh spam: on=$onT off=$offT")
    assert(w(6L) == ((0, 0.0)))
    assert(w(7L)._1 == 1)
  }

  test("logWeights: per-doc score is a mean-free SUM — deterministic under repartitioning") {
    val a = ImportanceResampling.logWeights(docs, "doc_id", "text", target, buckets = 256)
      .orderBy("doc_id").collect().toSeq
    val b = ImportanceResampling
      .logWeights(docs.repartition(7, col("doc_id")), "doc_id", "text", target, buckets = 256)
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("gumbelTopK: deterministic, a subset of the input, exactly k rows, salt-sensitive") {
    val w = ImportanceResampling.logWeights(docs, "doc_id", "text", target, buckets = 256)
    val s1 = ImportanceResampling.gumbelTopK(w, "doc_id", "logw", k = 3).collect()
    val s2 = ImportanceResampling.gumbelTopK(w, "doc_id", "logw", k = 3).collect()
    assert(s1.map(_.getLong(0)).toSeq == s2.map(_.getLong(0)).toSeq)
    assert(s1.length == 3)
    assert(s1.map(_.getLong(0)).toSet.subsetOf(Set(1L, 2L, 3L, 4L, 5L, 6L, 7L)))
    // A different salt redraws the noise; over k=3 of 7 the selection
    // or its key column must move (keys are salt-hashed doubles).
    val s3 = ImportanceResampling.gumbelTopK(w, "doc_id", "logw", k = 3, salt = "other")
      .collect()
    assert(s1.map(_.getDouble(3)).toSeq != s3.map(_.getDouble(3)).toSeq)
  }

  test("gumbelTopK: weight dominance — a heavy logw gap survives the noise") {
    // Gumbel noise has scale 1; a 50-nat gap cannot be overturned.
    val w = Seq((1L, 50.0), (2L, 49.0), (3L, -50.0), (4L, -51.0))
      .toDF("doc_id", "logw")
    val kept = ImportanceResampling.gumbelTopK(w, "doc_id", "logw", k = 2)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L))
  }

  test("admissionLogWeights ≡ logWeights bit-for-bit when the deltas are fit on the same corpora") {
    val deltas = ImportanceResampling.deltaArray(target, docs, "text", buckets = 256)
    assert(deltas.length == 256)
    val batch = ImportanceResampling.logWeights(docs, "doc_id", "text", target, buckets = 256)
      .orderBy("doc_id").collect().toSeq
    val admission = ImportanceResampling
      .admissionLogWeights(docs, "doc_id", "text", deltas, buckets = 256)
      .orderBy("doc_id").collect().toSeq
    assert(admission == batch)
    // null text behaves like the batch path's filtered null row
    val withNull = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(org.apache.spark.sql.Row(99L, null: String))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType))))
    val r = ImportanceResampling
      .admissionLogWeights(withNull, "doc_id", "text", deltas, buckets = 256)
      .collect().head
    assert(r.getInt(1) == 0 && r.getDouble(2) == 0.0)
  }

  test("deltaArray covers unseen buckets with the smoothing floor") {
    val deltas = ImportanceResampling.deltaArray(target, docs, "text", buckets = 256)
    // Unseen buckets share one floor value; seen buckets differ from it.
    val floor = deltas.groupBy(identity).maxBy(_._2.length)._1
    assert(deltas.count(_ == floor) > 0 && deltas.exists(_ != floor))
  }

  test("bucket counts obey the merge law: fit(A ∪ B) ≡ fold of per-part fits") {
    // Counts are additive, so the DSIR fit is INCREMENTAL by
    // construction (the sketch merge-law property): a streaming or
    // sharded fit folds per-part bucket counts and lands on the exact
    // whole-corpus multinomial — no refit, no approximation.
    val a = docs.filter(col("doc_id") <= 3)
    val b = docs.filter(col("doc_id") > 3)
    val whole = ImportanceResampling.bucketCounts(docs, "text", 256)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val parts = Seq(a, b).map(
      ImportanceResampling.bucketCounts(_, "text", 256)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
    val folded = parts.flatten.groupMapReduce(_._1)(_._2)(_ + _)
    assert(folded == whole)
  }

  test("buckets must be a power of two") {
    intercept[IllegalArgumentException] {
      ImportanceResampling.logWeights(docs, "doc_id", "text", target, buckets = 1000)
        .collect()
    }
  }
}
