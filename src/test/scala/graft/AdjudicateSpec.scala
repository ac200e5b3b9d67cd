package graft

import org.scalatest.funsuite.AnyFunSuite

class AdjudicateSpec extends AnyFunSuite {

  private def tmpJson(s: String): java.io.File = {
    val f = java.io.File.createTempFile("adj", ".json")
    f.deleteOnExit()
    java.nio.file.Files.write(f.toPath, s.getBytes("UTF-8"))
    f
  }

  test("parseQueries reads the per-query map of a BENCH_FULL-shaped line") {
    val f = tmpJson(
      """{"metric":"total","value":1.5,"unit":"sec","rounds":3,""" +
        """"queries":{"a_q":1.250,"b_q":0.250},"sf":"/tmp/sf0.1"}""")
    assert(Adjudicate.parseQueries(f) === Some(Map("a_q" -> 1.25, "b_q" -> 0.25)))
  }

  test("parseQueries is None on malformed or query-less input") {
    assert(Adjudicate.parseQueries(tmpJson("""{"metric":"total"}""")).isEmpty)
    assert(Adjudicate.parseQueries(tmpJson("not json at all")).isEmpty)
    assert(Adjudicate.parseQueries(new java.io.File("/nonexistent/x.json")).isEmpty)
  }

  test("the default flagship subset names real SparkEntry queries") {
    // the adjudication children run these by exact name in BOTH heads —
    // a rename in SparkEntry without updating the subset would make
    // every child fail its unknown-query require
    Adjudicate.DefaultSubset.foreach { q =>
      assert(SparkEntry.queries.contains(q), s"subset query $q missing from SparkEntry")
    }
  }

  test("prev-head snapshot, when present, is a readable jar with a commit") {
    // guards the committed artifact the harness-invoked re-pair needs;
    // skip silently if a future round removes the snapshot on purpose
    Adjudicate.prevJar().foreach { case (jar, commit) =>
      assert(jar.length() > 0)
      assert(commit.matches("[0-9a-f]{7,40}") || commit == "unknown")
      val zf = new java.util.zip.ZipFile(jar)
      try assert(zf.getEntry("graft/Bench.class") != null, "snapshot jar lacks graft.Bench")
      finally zf.close()
    }
  }
}
