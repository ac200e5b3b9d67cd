package graft.text

import graft.SparkSpec

class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  test("overlapping windows: coverage, overlap, short tail, 0-based ordinals") {
    val docs = Seq((1L, "a b c d e f g")).toDF("doc_id", "text") // 7 tokens
    val out = Chunking.chunkByTokens(docs, "doc_id", "text", width = 4, stride = 3)
      .orderBy("chunk_no").collect()
      .map(r => (r.getInt(1), r.getString(2), r.getInt(3)))
    // starts 0, 3, 6: [a..d], [d..g], [g]
    assert(out.toSeq == Seq(
      (0, "a b c d", 4),
      (1, "d e f g", 4),
      (2, "g", 1),
    ))
  }

  test("stride = width partitions the doc exactly; every token appears once") {
    val docs = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val out = Chunking.chunkByTokens(docs, "doc_id", "text", width = 2, stride = 2)
      .orderBy("chunk_no").collect().map(_.getString(2))
    assert(out.toSeq == Seq("a b", "c d", "e"))
    assert(out.flatMap(_.split(" ")).toSeq == Seq("a", "b", "c", "d", "e"))
  }

  test("doc shorter than width yields one full-doc chunk; empty docs yield none") {
    val docs = Seq((1L, "x y"), (2L, ""), (3L, "   ")).toDF("doc_id", "text")
    val out = Chunking.chunkByTokens(docs, "doc_id", "text", width = 10, stride = 10)
      .collect().map(r => (r.getLong(0), r.getString(2), r.getInt(3)))
    assert(out.toSeq == Seq((1L, "x y", 2)))
  }

  test("tokenization is normalized (case, whitespace) like the rest of the text family") {
    val docs = Seq((1L, "  Hello\t\tWORLD  ")).toDF("doc_id", "text")
    val out = Chunking.chunkByTokens(docs, "doc_id", "text", 5, 5).collect()
    assert(out.head.getString(2) == "hello world")
  }
}
