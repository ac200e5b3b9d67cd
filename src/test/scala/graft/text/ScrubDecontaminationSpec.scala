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
}
