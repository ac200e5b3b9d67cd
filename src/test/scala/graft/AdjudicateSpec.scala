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

  test("dirty working tree voids the same-head label; clean tree keeps it") {
    // the r13 failure mode: a bench run from a dirty worktree whose
    // HEAD matched the prev-head commit was labeled SAME-HEAD even
    // though the classes under test differed from HEAD. The label
    // logic is commitsSame && !dirty — exercise both git helpers
    // against a synthetic repo so the spec never depends on this
    // repo's own (round-varying) git state.
    val dir = java.nio.file.Files.createTempDirectory("adjrepo").toFile
    def git(args: String*): String = {
      val p = new ProcessBuilder(
        (Seq("git", "-c", "user.email=spec@test", "-c", "user.name=spec") ++ args): _*)
        .directory(dir).redirectErrorStream(true).start()
      val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
      assert(p.waitFor() == 0, s"git ${args.mkString(" ")} failed: $out")
      out.trim
    }
    git("init", "-q")
    val src = new java.io.File(dir, "src/main")
    assert(src.mkdirs())
    java.nio.file.Files.write(
      new java.io.File(src, "X.scala").toPath, "object X\n".getBytes("UTF-8"))
    git("add", "-A"); git("commit", "-q", "-m", "a")
    val commitA = git("rev-parse", "HEAD")
    // clean tree at the same commit: self-pair detection holds
    assert(Adjudicate.sameCodeAsHead(commitA, dir))
    assert(!Adjudicate.workingTreeDirty(dir))
    // dirty src/main: committed diff still reads clean but the label
    // must fall back to a real pair — workingTreeDirty flips
    java.nio.file.Files.write(
      new java.io.File(src, "X.scala").toPath, "object X { val y = 1 }\n".getBytes("UTF-8"))
    assert(Adjudicate.sameCodeAsHead(commitA, dir), "committed trees unchanged")
    assert(Adjudicate.workingTreeDirty(dir), "uncommitted src/main edit must read dirty")
    // a new commit over src/main breaks sameCodeAsHead outright
    git("add", "-A"); git("commit", "-q", "-m", "b")
    assert(!Adjudicate.sameCodeAsHead(commitA, dir))
    assert(!Adjudicate.workingTreeDirty(dir))
    // dirt OUTSIDE the compared paths (docs, artifacts) must NOT void
    // the label — the bench's own BENCH_FULL.json write would
    // otherwise mark every run dirty
    java.nio.file.Files.write(
      new java.io.File(dir, "NOTES.md").toPath, "x\n".getBytes("UTF-8"))
    assert(!Adjudicate.workingTreeDirty(dir))
    // "unknown" commit (no meta.json) always reads as a real pair
    assert(!Adjudicate.sameCodeAsHead("unknown", dir))
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
