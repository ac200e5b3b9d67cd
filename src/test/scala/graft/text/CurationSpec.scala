package graft.text

import graft.SparkSpec

class CurationSpec extends SparkSpec {
  import spark.implicits._

  private val english =
    "the quick brown fox jumps over the lazy dog and runs into the green field with joy for hours"
  private val docs = Seq(
    (1L, english),
    (2L, english), // exact duplicate → dropped by exact dedup (keep id 1)
    (3L, english.replace("green", "wide")), // near duplicate → minhash stage
    (4L, "der hund und die katze sind nicht mit dem vogel von der eine stadt"), // de
    (5L, "too short"), // under minTokens
    (6L, "!!! ??? ... ;;; ::: !!! ??? ... ;;; ::: !!! ???"), // junk quality
  ).toDF("doc_id", "text")

  private val cfg = Curation.Config(
    minQuality = 0.3, langs = Seq("en"), minTokens = 5,
    maxTokens = 1 << 20, nearDupThreshold = Some(0.5))

  test("deterministic prefix: filters + exact dedup, annotations kept") {
    val out = Curation.filterAndExactDedup(docs, "doc_id", "text", cfg)
    val ids = out.select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L, 3L)) // 2 exact-dup'd, 4 lang, 5 length, 6 quality
    val r = out.filter($"doc_id" === 1L).head()
    assert(r.getAs[String]("curation_lang") == "en")
    assert(r.getAs[Double]("curation_quality") >= 0.3)
    assert(r.getAs[Int]("curation_tokens") == english.split(" ").length)
  }

  test("full pipeline drops the near duplicate; containment holds") {
    val full = Curation.curate(docs, "doc_id", "text", cfg)
      .select("doc_id").as[Long].collect().toSet
    assert(full == Set(1L)) // 3 is a word-set near-dup of 1 at j≥0.5
    val prefix = Curation.filterAndExactDedup(docs, "doc_id", "text", cfg)
      .select("doc_id").as[Long].collect().toSet
    assert(full.subsetOf(prefix))
  }

  test("nearDupThreshold = None reduces to the deterministic prefix") {
    val a = Curation.curate(docs, "doc_id", "text", cfg.copy(nearDupThreshold = None))
      .select("doc_id").as[Long].collect().toSet
    val b = Curation.filterAndExactDedup(docs, "doc_id", "text", cfg)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b)
  }

  test("idempotence: curating an already-curated corpus changes nothing") {
    val once = Curation.curate(docs, "doc_id", "text", cfg)
      .select("doc_id", "text")
    val twice = Curation.curate(once, "doc_id", "text", cfg)
    assert(twice.select("doc_id").as[Long].collect().toSet ==
      once.select("doc_id").as[Long].collect().toSet)
  }
}
