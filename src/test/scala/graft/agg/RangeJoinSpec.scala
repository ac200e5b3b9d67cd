package graft.agg

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  // window = 100 µs for readable fixtures
  private val W = 100L

  private def clicks = Seq(
    ("u1", 1L, 250L),
    ("u1", 2L, 1000L),
    ("u2", 3L, 500L),
  ).toDF("k", "lid", "lt")

  private def views = Seq(
    ("u1", 10L, 150L), // exactly lt-W for click 1 → inclusive match
    ("u1", 11L, 249L), // just before click 1 → match
    ("u1", 12L, 250L), // equal to click 1 → half-open, NO match
    ("u1", 13L, 930L), // within (900,1000) for click 2 → match (crosses bucket 9→10)
    ("u2", 14L, 450L), // other key, matches click 3 only
  ).toDF("k", "rid", "rt")

  test("half-open lookback window with exact boundary semantics") {
    val out = RangeJoin.lookbackJoin(clicks, views, Seq("k"), "lt", "rt", W)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(out === Set((1L, 10L), (1L, 11L), (2L, 13L), (3L, 14L)))
  }

  test("bucketed form equals the naive inequality join") {
    val naive = clicks.as("c").join(views.as("v"),
      $"c.k" === $"v.k" && $"v.rt" >= $"c.lt" - W && $"v.rt" < $"c.lt")
      .select($"c.lid", $"v.rid").as[(Long, Long)].collect().toSet
    val bucketed = RangeJoin.lookbackJoin(clicks, views, Seq("k"), "lt", "rt", W)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(bucketed === naive)
  }

  test("right rows never duplicate in the output despite 2x bucket expansion") {
    val out = RangeJoin.lookbackJoin(clicks, views, Seq("k"), "lt", "rt", W)
      .select("lid", "rid").as[(Long, Long)].collect().toSeq
    assert(out.distinct === out)
  }
}
