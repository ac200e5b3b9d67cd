package graft.quality

import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM contracts of the telemetry registry (the Spark-side
  * listener path is exercised end-to-end in TextDedupSpec /
  * SimilaritySpec): rate-limit keying and reset hygiene. */
class SkewTelemetrySpec extends AnyFunSuite {

  test("familyOf strips the prefix and the per-call counter") {
    assert(SkewTelemetry.familyOf("graft_skew_minhash_13") == "minhash")
    assert(SkewTelemetry.familyOf("graft_skew_semdedup_1") == "semdedup")
    // a family name that itself ends in digits only loses the LAST
    // underscore-digits group (the call counter)
    assert(SkewTelemetry.familyOf("graft_skew_ivf256_7") == "ivf256")
    // no counter suffix: name passes through un-truncated
    assert(SkewTelemetry.familyOf("graft_skew_minhash") == "minhash")
  }

  test("reset clears lastEvent, the recent map, and suppression counters") {
    SkewTelemetry.reset()
    assert(SkewTelemetry.lastEvent.isEmpty)
    assert(SkewTelemetry.eventFor("graft_skew_minhash_1").isEmpty)
    assert(SkewTelemetry.suppressedWarnings("minhash") == 0L)
  }

  test("nextMetricName is unique and carries the family") {
    val a = SkewTelemetry.nextMetricName("minhash")
    val b = SkewTelemetry.nextMetricName("minhash")
    assert(a != b)
    assert(a.startsWith(SkewTelemetry.MetricPrefix))
    assert(SkewTelemetry.familyOf(a) == "minhash")
  }
}
