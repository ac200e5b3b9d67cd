package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ScrubDecontaminationSpec extends SparkSpec {
  import spark.implicits._

  test("redact: emails, IPs, phones replaced in dependency order") {
    val rows = Seq(
      (1L, "mail a.user+tag@sub.example.org now"),
      (2L, "server at 192.168.0.1 responded"),
      (3L, "call +1 (555) 867-5309 today"),
      (4L, "all three: x@y.io 10.0.0.7 and 555 123 4567"),
      (5L, "clean text, nothing to redact"),
    ).toDF("id", "t")
    val out = rows.select($"id", Scrub.redact($"t").as("s")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "mail <EMAIL> now")
    assert(out(2L) == "server at <IP> responded")
    assert(out(3L) == "call <PHONE> today")
    assert(out(4L) == "all three: <EMAIL> <IP> and <PHONE>")
    assert(out(5L) == "clean text, nothing to redact")
  }

  test("redactionCount counts markers in scrubbed text") {
    val df = Seq("a@b.co c@d.io plain").toDF("t")
      .select(Scrub.redact($"t").as("s"))
    assert(df.select(Scrub.redactionCount($"s", "<EMAIL>")).head().getInt(0) == 2)
    assert(df.select(Scrub.redactionCount($"s", "<IP>")).head().getInt(0) == 0)
  }

  test("containmentScores: exact containment via inverted-index join, self-pairs excluded") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta other words"), // shares 3 of bench's 5 bigrams
      (3L, "totally unrelated content here now"),
      (10L, "alpha beta gamma delta epsilon zeta"), // the benchmark doc itself
    ).toDF("doc_id", "text")
    val bench = corpus.filter($"doc_id" === 10L)
    val out = Decontamination.containmentScores(
      corpus, bench, "doc_id", "doc_id", "text", k = 2, threshold = 0.3)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(1L) == 1.0) // identical text: full containment
    assert(out(2L) == 0.6) // 3 of 5 benchmark bigrams present
    assert(!out.contains(3L)) // below threshold
    assert(!out.contains(10L)) // self-pair excluded
  }

  test("bloomGatedContainmentScores ≡ containmentScores; the gate actually prunes") {
    // 40 corpus docs with distinct vocabularies + a handful of partial
    // overlaps — enough distinct grams that the gate must prune
    // non-benchmark grams while keeping every true match.
    val corpus = ((1L to 40L).map(i =>
      (i, s"w${i}a w${i}b w${i}c w${i}d w${i}e w${i}f")) ++ Seq(
      (101L, "alpha beta gamma delta epsilon zeta"),
      (102L, "alpha beta gamma delta other words"),
      (200L, "alpha beta gamma delta epsilon zeta"), // the benchmark doc
    )).toDF("doc_id", "text")
    val bench = corpus.filter($"doc_id" === 200L)

    val exact = Decontamination.containmentScores(
      corpus, bench, "doc_id", "doc_id", "text", k = 2, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val gated = Decontamination.bloomGatedContainmentScores(
      corpus, bench, "doc_id", "doc_id", "text", k = 2, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(gated == exact, s"gated $gated != exact $exact")
    assert(exact.map(_._1) == Set(101L, 102L))

    // The gate itself: every benchmark gram passes (no false
    // negatives), and the 240-gram corpus vocabulary is mostly pruned
    // (w{i}x grams share no benchmark positions at 7x4096 bits).
    val masks = Sketches.bloomMasks(
      Sketches.bloomBitsOf(
        TextDedup.withShingles(bench, "text", 2, "_sh")
          .select(explode($"_sh").as("_gram")), "_gram"), 7, 4096)
    val grams = TextDedup.withShingles(corpus, "text", 2, "_sh")
      .select(explode($"_sh").as("_gram")).distinct()
    val total = grams.count()
    val pass = grams.filter(
      Sketches.bloomTest(call_function("graft_token_hash", $"_gram"), masks, 4096)).count()
    assert(pass >= 5, "benchmark's own grams must all pass") // 5 bench bigrams
    assert(pass < total / 4, s"gate passed $pass of $total grams — not pruning")
  }

  test("bloomMasks packs exactly the bits frame's positions") {
    val keys = Seq("alpha", "beta", "gamma").toDF("k")
    val bits = Sketches.bloomBitsOf(keys, "k", depth = 3, width = 256)
    val masks = Sketches.bloomMasks(bits, depth = 3, width = 256)
    val set = bits.collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    val unpacked = (for {
      j <- 0 until 3; w <- 0 until 4; b <- 0 until 64
      if (masks(j)(w) & (1L << b)) != 0L
    } yield (j, w * 64L + b)).toSet
    assert(unpacked == set)
    // depth/width mismatch against the frame must fail loudly, not
    // silently corrupt buckets
    intercept[IllegalArgumentException] { Sketches.bloomMasks(bits, depth = 2, width = 256) }
  }
}
