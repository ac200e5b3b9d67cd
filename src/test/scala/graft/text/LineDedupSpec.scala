package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LineDedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "HEADER\nunique body one\nFOOTER"),
    (2L, "HEADER\nunique body two\nFOOTER"),
    (3L, "HEADER\nunique body three\nFOOTER"),
    (4L, "HEADER\nFOOTER"), // fully boilerplate
    (5L, "solo line\nHEADER\nanother solo"),
  ).toDF("doc_id", "text")

  test("lines above the doc-frequency cap are removed; body survives in order") {
    val out = LineDedup.removeFrequentLines(docs, "doc_id", "text", maxDocFreq = 2)
      .orderBy("doc_id").collect()
    // HEADER appears in 5 docs, FOOTER in 4 — both > 2 → dropped.
    assert(out.map(r => r.getLong(0) -> r.getString(2)).toSeq === Seq(
      1L -> "unique body one",
      2L -> "unique body two",
      3L -> "unique body three",
      4L -> "",
      5L -> "solo line\nanother solo",
    ))
    assert(out.map(_.getInt(1)).toSeq === Seq(1, 1, 1, 0, 2))
  }

  test("every input document is retained, even when fully boilerplate") {
    val out = LineDedup.removeFrequentLines(docs, "doc_id", "text", maxDocFreq = 2)
    assert(out.count() === docs.count())
  }

  test("doc frequency counts distinct documents, not occurrences") {
    // 'dup' appears 3x but only in ONE doc → doc_freq 1 ≤ 2 → kept.
    val d = Seq((1L, "dup\ndup\ndup"), (2L, "other")).toDF("doc_id", "text")
    val freq = LineDedup.lineDocFrequency(d, "doc_id", "text")
      .where(col("line") === "dup").select("doc_freq").as[Long].head()
    assert(freq === 1L)
    val out = LineDedup.removeFrequentLines(d, "doc_id", "text", maxDocFreq = 2)
      .where(col("doc_id") === 1).select("clean_text").as[String].head()
    assert(out === "dup\ndup\ndup")
  }

  test("null text yields zero kept lines, not a phantom null line") {
    val d = Seq((1L, Some("keep me")), (2L, Option.empty[String])).toDF("doc_id", "text")
    val out = LineDedup.removeFrequentLines(d, "doc_id", "text", maxDocFreq = 10)
      .orderBy("doc_id").collect()
    assert(out(1).getInt(1) === 0 && out(1).getString(2) === "")
    assert(out(0).getInt(1) === 1 && out(0).getString(2) === "keep me")
  }

  test("broadcast size gate: gated ≡ forced on both sides of the bound") {
    // Frequent set here is {HEADER, FOOTER} = 2 lines. Auto-broadcast
    // is pinned OFF so the join strategy reflects the operator's HINT
    // decision, not the test corpus's tiny statistics (at the 100 TB
    // regime this gate exists for, stats never auto-broadcast).
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val expect = LineDedup.removeFrequentLines(docs, "doc_id", "text", maxDocFreq = 2)
        .orderBy("doc_id").collect().toSeq

      // At/below the bound: the hint stays, the anti-join broadcasts.
      val under = LineDedup.removeFrequentLines(docs, "doc_id", "text",
        maxDocFreq = 2, broadcastMaxLines = 2)
      val underPlan = under.queryExecution.executedPlan.toString
      assert(underPlan.contains("BroadcastHashJoin"),
        s"expected a broadcast anti-join under the bound:\n$underPlan")
      assert(under.orderBy("doc_id").collect().toSeq === expect)

      // Above the bound: no hint — a shuffled left-anti (the frequent
      // set is data-dependent; a forced hint would ride to the 8 GB
      // broadcast hard limit on a boilerplate-heavy 100 TB corpus).
      val over = LineDedup.removeFrequentLines(docs, "doc_id", "text",
        maxDocFreq = 2, broadcastMaxLines = 1)
      val overPlan = over.queryExecution.executedPlan.toString
      assert(!overPlan.contains("BroadcastHashJoin"),
        s"expected the hint dropped above the bound:\n$overPlan")
      assert(over.orderBy("doc_id").collect().toSeq === expect)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("idempotence: a second pass over cleaned text removes nothing") {
    val once = LineDedup.removeFrequentLines(docs, "doc_id", "text", maxDocFreq = 2)
      .select(col("doc_id"), col("clean_text").as("text"))
    val twice = LineDedup.removeFrequentLines(once, "doc_id", "text", maxDocFreq = 2)
    // After cleaning, surviving lines each appear in ≤ 2 docs (an empty
    // clean_text contributes an '' line in 1 doc) — nothing new drops.
    val a = once.orderBy("doc_id").select("text").as[String].collect()
    val b = twice.orderBy("doc_id").select("clean_text").as[String].collect()
    assert(a.toSeq === b.toSeq)
  }
}
