package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

class BenchMergeJvmsSpec extends AnyFunSuite {

  private def jb(
      min: Double,
      steady: Double,
      robust: Double,
      qs: Map[String, Double],
      ok: Boolean = true,
      failed: Seq[String] = Seq.empty,
      sf: String = "/tmp/sf10",
      skipped: Seq[String] = Seq("v2", "v5")) =
    BenchMergeJvms.JvmBench("mem", sf, qs, min, steady, robust,
      rounds = 3, spreadPct = 2.0, dispersionOk = ok,
      skipped = skipped, failed = failed)

  test("per-query min across JVMs; min_value is the cross-JVM composite") {
    val a = jb(3.0, 3.2, 3.4, Map("q1" -> 1.0, "q2" -> 2.0))
    val b = jb(2.9, 3.1, 3.3, Map("q1" -> 0.8, "q2" -> 2.1))
    val json = BenchMergeJvms.merge(Seq(a, b))
    assert(json.contains(""""q1":0.800"""))
    assert(json.contains(""""q2":2.000"""))
    assert(json.contains(""""min_value":2.800"""))
    assert(json.contains(""""jvms":2"""))
    assert(json.contains(""""value_source":"min_composite_multi_jvm""""))
  }

  test("a single input is a legal degenerate merge: pass-through with spread 0") {
    // a wall-bounded campaign that cut its optional bracket JVMs must
    // still ship a normalized artifact instead of dying under set -e
    val a = jb(3.0, 3.2, 3.4, Map("q1" -> 1.0, "q2" -> 2.0))
    val json = BenchMergeJvms.merge(Seq(a))
    assert(json.contains(""""jvms":1"""))
    assert(json.contains(""""min_value":3.000"""))
    assert(json.contains(""""q1":1.000""") && json.contains(""""q2":2.000"""))
    assert(json.contains(""""jvm_spread_pct":0.000"""))
    intercept[IllegalArgumentException] { BenchMergeJvms.merge(Seq.empty) }
  }

  test("jvm_spread_pct brackets the fresh-JVM amplitude; medians are per-JVM") {
    val a = jb(10.0, 11.0, 12.0, Map("q1" -> 10.0))
    val b = jb(11.0, 11.5, 12.5, Map("q1" -> 11.0))
    val c = jb(10.5, 11.2, 12.2, Map("q1" -> 10.5))
    val json = BenchMergeJvms.merge(Seq(a, b, c))
    // (11.0 - 10.0) / 10.0 = 10%
    assert(json.contains(""""jvm_spread_pct":10.000"""))
    assert(json.contains(""""steady_value":11.200"""))
    assert(json.contains(""""robust_value":12.200"""))
    assert(json.contains(""""rounds":9"""))
  }

  test("a JVM past its gate demotes the headline to the median steady") {
    val a = jb(3.0, 3.2, 3.4, Map("q1" -> 3.0))
    val b = jb(2.0, 3.3, 3.5, Map("q1" -> 2.0), ok = false)
    val json = BenchMergeJvms.merge(Seq(a, b))
    assert(json.contains(""""dispersion_ok":false"""))
    assert(json.contains(""""value_source":"steady""""))
    // median of (3.2, 3.3) with upper-median convention = 3.3
    assert(json.contains(""""value":3.300"""))
    assert(json.contains(""""min_value":2.000"""))
  }

  test("failed means failed in EVERY JVM; one JVM's sample rescues a query") {
    val a = jb(1.0, 1.1, 1.2, Map("q1" -> 1.0), failed = Seq("q2", "q3"))
    val b = jb(1.5, 1.6, 1.7, Map("q1" -> 1.1, "q2" -> 0.4), failed = Seq("q3"))
    val json = BenchMergeJvms.merge(Seq(a, b))
    assert(json.contains(""""failed":["q3"]"""))
    assert(json.contains(""""q2":0.400"""))
  }

  test("inputs on different corpora or skip lists fail loudly") {
    val a = jb(1.0, 1.1, 1.2, Map("q1" -> 1.0))
    val b = jb(1.0, 1.1, 1.2, Map("q1" -> 1.0), sf = "/tmp/sf1")
    intercept[IllegalArgumentException](BenchMergeJvms.merge(Seq(a, b)))
    val c = jb(1.0, 1.1, 1.2, Map("q1" -> 1.0), skipped = Seq("v2"))
    intercept[IllegalArgumentException](BenchMergeJvms.merge(Seq(a, c)))
    // a SINGLE input is legal since r15 (degenerate pass-through);
    // only an EMPTY input throws — covered by the single-input test
  }

  test("round-trips a real Bench artifact file") {
    val f = Files.createTempFile("bench", ".json")
    val json =
      """{"metric":"suite_seconds","value":3.000,"unit":"sec","rounds":4,""" +
        """"spread_pct":1.147,"dispersion_ok":true,"value_source":"min_composite",""" +
        """"min_value":3.000,"robust_value":3.400,"steady_value":3.200,""" +
        """"failed":[],"skipped_baseline":["v2_cosine_pairs"],""" +
        """"queries":{"q1":1.000,"q2":2.000},"sf":"/tmp/sf10"}"""
    Files.write(f, json.getBytes(StandardCharsets.UTF_8))
    val b = BenchMergeJvms.read(f.toString)
    assert(b.queries === Map("q1" -> 1.0, "q2" -> 2.0))
    assert(b.minValue === 3.0)
    assert(b.rounds === 4)
    assert(b.dispersionOk)
    assert(b.skipped === Seq("v2_cosine_pairs"))
    Files.delete(f)
  }
}
