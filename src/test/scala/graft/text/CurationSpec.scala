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

  test("skewed fixture: one hot near-dup cluster collapses via the linear path") {
    import org.apache.spark.sql.functions._
    // 400 docs in ONE near-identical cluster (word-order shuffles of
    // the same long sentence + one unique trailing word each → word-set
    // jaccard 21/22 ≈ 0.955 against the base) + 50 unrelated docs. With
    // all-pairs enumeration this bucket is ~80k in-bucket pairs; the
    // linear path verifies each member against one representative per
    // band (O(B) per bucket) and must still collapse the cluster to a
    // single survivor — the shape that holds at 100 TB when a template
    // page floods a bucket.
    val base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon phi").split(" ")
    val hot = (0 until 400).map { i =>
      val words = (i % base.length) match { case r => base.drop(r) ++ base.take(r) }
      (i.toLong, words.mkString(" ") + s" unique$i")
    }
    val cold = (0 until 50).map(i =>
      (1000L + i, s"completely unrelated document number $i about topic$i with content$i only"))
    val corpus = (hot ++ cold).toDF("doc_id", "text")

    val survivors = TextDedup.minhashDedupLinear(corpus, "doc_id", "text", threshold = 0.9)
      .select("doc_id").as[Long].collect().toSet
    // cluster min-id always survives; the cluster must collapse hard
    // (identical word-set collapse alone would leave ~21 reps — the
    // rotations share word sets pre-"unique" suffix but each doc's
    // suffix makes every set distinct, so this exercises LSH + verify,
    // not just the exact-collapse groupBy)
    assert(survivors.contains(0L))
    val hotSurvivors = survivors.count(_ < 1000L)
    assert(hotSurvivors <= 5, s"hot cluster left $hotSurvivors survivors; linear path should collapse it")
    // cold docs are untouched (no near-dups among them)
    assert(survivors.count(_ >= 1000L) == 50)
    // containment law versus the all-pairs form: rep-verify can only
    // drop a subset of what all-pairs enumeration drops
    val allPairs = TextDedup.minhashDedup(corpus, "doc_id", "text", threshold = 0.9)
      .select("doc_id").as[Long].collect().toSet
    assert(allPairs.subsetOf(survivors))
  }
}
