package graft.graph

import graft.SparkSpec

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def cc(pairs: Seq[(Long, Long)], maxIters: Int = 20): Map[Long, Long] =
    ConnectedComponents
      .components(pairs.toDF("a", "b"), "a", "b", maxIters)
      .as[(Long, Long)].collect().toMap

  test("two components get their min ids; orientation and duplicates don't matter") {
    val got = cc(Seq((5L, 3L), (3L, 9L), (9L, 5L), (20L, 30L), (30L, 20L)))
    assert(got == Map(3L -> 3L, 5L -> 3L, 9L -> 3L, 20L -> 20L, 30L -> 20L))
  }

  test("a chain needs diameter rounds and converges to the global min") {
    // 0-1-2-...-9 as a path: worst case for min-label propagation
    val chain = (0L until 9L).map(i => (i, i + 1))
    val got = cc(chain)
    assert(got.keySet == (0L to 9L).toSet)
    assert(got.values.toSet == Set(0L))
  }

  test("star graphs (the LSH rep-pair shape) converge in one round") {
    val star = (1L to 50L).map(i => (0L, i))
    val got = cc(star, maxIters = 2)
    assert(got.values.toSet == Set(0L))
  }

  test("non-convergence throws instead of returning wrong labels") {
    val chain = (0L until 9L).map(i => (i, i + 1))
    intercept[IllegalStateException] { cc(chain, maxIters = 2) }
  }

  test("empty pair set yields an empty labeling") {
    assert(cc(Seq.empty).isEmpty)
  }
}
