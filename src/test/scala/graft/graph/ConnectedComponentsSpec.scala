package graft.graph

import graft.SparkSpec

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def cc(
      pairs: Seq[(Long, Long)],
      maxIters: Int = 20,
      maxDriverQuotientRows: Int = ConnectedComponents.DefaultMaxDriverQuotientRows,
  ): Map[Long, Long] =
    ConnectedComponents
      .components(pairs.toDF("a", "b"), "a", "b", maxIters, maxDriverQuotientRows)
      .as[(Long, Long)].collect().toMap

  test("two components get their min ids; orientation and duplicates don't matter") {
    val got = cc(Seq((5L, 3L), (3L, 9L), (9L, 5L), (20L, 30L), (30L, 20L)))
    assert(got == Map(3L -> 3L, 5L -> 3L, 9L -> 3L, 20L -> 20L, 30L -> 20L))
  }

  test("a chain (worst case for propagation) escalates and converges to the global min") {
    // 0-1-2-...-9 as a path: propagation alone would need diameter
    // rounds; the escalation to star contraction handles it
    val chain = (0L until 9L).map(i => (i, i + 1))
    val got = cc(chain)
    assert(got.keySet == (0L to 9L).toSet)
    assert(got.values.toSet == Set(0L))
  }

  private def symOf(pairs: Seq[(Long, Long)]) = {
    import org.apache.spark.sql.functions.col
    val e = pairs.toDF("src", "dst")
    e.unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
  }

  test("star contraction: 1000-vertex path converges in <= ~2*log2(n) rounds") {
    val n = 1000L
    val chain = (0L until n - 1).map(i => (i, i + 1))
    val (labels, rounds) =
      ConnectedComponents.starComponents(symOf(chain), maxIters = 25)
    val bound = 2 * (math.log(n.toDouble) / math.log(2.0)).ceil.toInt // = 20
    assert(rounds <= bound, s"took $rounds rounds, bound $bound")
    val got = labels.as[(Long, Long)].collect().toMap
    assert(got.keySet == (0L until n).toSet)
    assert(got.values.toSet == Set(0L))
  }

  test("a 1000-link chain converges under the DEFAULT maxIters (the r7 operational ceiling)") {
    val chain = (0L until 999L).map(i => (i, i + 1))
    val got = cc(chain) // maxIters = 20, would need 999 propagation rounds
    assert(got.values.toSet == Set(0L))
    assert(got.size == 1000)
  }

  test("law: star contraction matches union-find on random graphs (fixed seeds)") {
    import org.scalacheck.{Gen, rng}
    val edgeGen = for {
      a <- Gen.choose(0L, 40L)
      b <- Gen.choose(0L, 40L) if a != b
    } yield (a, b)
    val graphGen = Gen.listOfN(30, edgeGen)
    for (seed <- 10L to 14L) {
      val edges = graphGen(Gen.Parameters.default, rng.Seed(seed))
        .getOrElse(fail(s"generator failed for seed $seed"))
      val (labels, _) = ConnectedComponents.starComponents(symOf(edges), maxIters = 20)
      val viaProp = cc(edges)
      assert(labels.as[(Long, Long)].collect().toMap == viaProp, s"seed $seed")
    }
  }

  test("star graphs (the LSH rep-pair shape) converge in one round") {
    val star = (1L to 50L).map(i => (0L, i))
    val got = cc(star, maxIters = 2)
    assert(got.values.toSet == Set(0L))
  }

  test("non-convergence throws instead of returning wrong labels") {
    // gate the driver path off so the distributed star fallback (the
    // only path with a round bound) is the one exercised
    val chain = (0L until 9L).map(i => (i, i + 1))
    intercept[IllegalStateException] {
      cc(chain, maxIters = 2, maxDriverQuotientRows = 0)
    }
  }

  test("law: driver union-find gate and star fallback agree (fixed seeds)") {
    import org.scalacheck.{Gen, rng}
    val edgeGen = for {
      a <- Gen.choose(0L, 40L)
      b <- Gen.choose(0L, 40L) if a != b
    } yield (a, b)
    val graphGen = Gen.listOfN(30, edgeGen)
    for (seed <- 20L to 23L) {
      val edges = graphGen(Gen.Parameters.default, rng.Seed(seed))
        .getOrElse(fail(s"generator failed for seed $seed"))
      assert(cc(edges) == cc(edges, maxDriverQuotientRows = 0), s"seed $seed")
    }
  }

  test("empty pair set yields an empty labeling") {
    assert(cc(Seq.empty).isEmpty)
  }

  test("LongLongMap: primitive parent table matches java.util.HashMap under churn") {
    val gen = new scala.util.Random(7)
    val m = new LongLongMap(4) // tiny initial capacity forces several grows
    val ref = new java.util.HashMap[Long, Long]()
    // churn includes key 0 (valid), negative keys, and overwrites
    for (_ <- 1 to 20000) {
      val k = gen.nextInt(4000).toLong - 2000L
      val v = gen.nextLong()
      m.put(k, v)
      ref.put(k, v)
    }
    assert(m.size == ref.size)
    ref.forEach((k, v) => assert(m.getOrDefault(k, Long.MinValue) == v, s"key $k"))
    assert(m.getOrDefault(999999L, -5L) == -5L) // absent key → default
    var seen = 0
    m.foreachKey { k => assert(ref.containsKey(k)); seen += 1 }
    assert(seen == ref.size)
  }

  test("driver gate boundary: quotient exactly at / just over the gate agree") {
    // a 12-vertex chain whose quotient has few rows: run components with
    // the gate sized to exactly the quotient row count (driver path) and
    // to one less (star path) — identical labels either way
    val edges = (0L until 11L).map(i => (i, i + 1))
    val df = edges.toDF("a", "b")
    def run(gate: Int) = ConnectedComponents
      .components(df, "a", "b", maxDriverQuotientRows = gate)
      .as[(Long, Long)].collect().toMap
    // quotient row count for the chain: measure by running once with a
    // huge gate (driver path always taken), then brute-force the
    // boundary pair around every plausible size
    val expected = (0L to 11L).map(_ -> 0L).toMap
    for (gate <- Seq(0, 1, 2, 4, 8, 16, 1 << 20)) {
      assert(run(gate) == expected, s"gate $gate")
    }
  }

  test("law: random graphs match a driver-side union-find (fixed seeds)") {
    import org.scalacheck.{Gen, rng}
    val edgeGen = for {
      a <- Gen.choose(0L, 40L)
      b <- Gen.choose(0L, 40L) if a != b
    } yield (a, b)
    val graphGen = Gen.listOfN(30, edgeGen)
    def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      parent.keys.map(v => v -> find(v)).toMap
    }
    for (seed <- 1L to 5L) {
      val edges = graphGen(Gen.Parameters.default, rng.Seed(seed))
        .getOrElse(fail(s"generator failed for seed $seed"))
      // union-find roots are component minima because union always
      // points the larger root at the smaller
      assert(cc(edges) == unionFind(edges), s"seed $seed")
    }
  }
}
