package graft.sim

import graft.SparkSpec

class FusionSpec extends SparkSpec {
  import spark.implicits._

  test("rrfFuse: hand-computed RRF scores, sources count, ordering") {
    val a = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3)).toDF("query_id", "doc_id", "rank")
    val b = Seq((1L, 11L, 1), (1L, 13L, 2)).toDF("query_id", "doc_id", "rank")
    val out = Fusion.rrfFuse(Seq(a, b), "query_id", "doc_id", k = 10)
      .orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getInt(3), r.getInt(4)))
    // doc 11 retrieved by both (ranks 2 and 1): 1/62 + 1/61; the rest once
    def rr(rank: Int) = 1.0 / (60 + rank)
    val expected = Seq(
      (11L, rr(2) + rr(1), 2),
      (10L, rr(1), 1),
      (13L, rr(2), 1),
      (12L, rr(3), 1),
    )
    assert(out.map(_._1).toSeq == expected.map(_._1))
    out.zip(expected).foreach { case ((_, got, srcs, _), (_, want, wantSrcs)) =>
      assert(math.abs(got - want) < 1e-6)
      assert(srcs == wantSrcs)
    }
    assert(out.map(_._4).toSeq == Seq(1, 2, 3, 4))
  }

  test("rrfFuse: fusing a single ranking preserves its order; k truncates") {
    val a = Seq((1L, 10L, 1), (1L, 11L, 2), (2L, 20L, 1)).toDF("query_id", "doc_id", "rank")
    val out = Fusion.rrfFuse(Seq(a), "query_id", "doc_id", k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(4))).toSet
    assert(out == Set((1L, 10L, 1), (2L, 20L, 1))) // per-query top-1 only
  }
}
