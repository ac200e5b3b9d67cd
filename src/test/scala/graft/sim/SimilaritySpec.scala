package graft.sim

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def vdf = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f), "a"),
    (2L, Array(0.0f, 1.0f, 0.0f), "a"),
    (3L, Array(1.0f, 1.0f, 0.0f), "a"),
    (4L, Array(2.0f, 0.0f, 0.0f), "b"), // parallel to 1
  ).toDF("vec_id", "embedding", "label")

  test("native cosine kernel matches hand values and the HOF formulation") {
    val pairs = vdf.as("x").crossJoin(vdf.as("y"))
      .select(col("x.vec_id").as("i"), col("y.vec_id").as("j"),
        Similarity.cosine(col("x.embedding"), col("y.embedding")).as("fast"),
        Similarity.cosineHof(col("x.embedding"), col("y.embedding")).as("hof"))
    val rows = pairs.collect()
    rows.foreach(r => assert(r.getDouble(2) == r.getDouble(3),
      s"native vs HOF mismatch at ${r.getLong(0)},${r.getLong(1)}"))
    val m = rows.map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(m((1L, 2L)) == 0.0)
    assert(m((1L, 4L)) == 1.0)
    assert(math.abs(m((1L, 3L)) - 1.0 / math.sqrt(2)) < 1e-12)
  }

  test("bruteForceTopK ranks by rounded sim desc with id tiebreak, excludes self") {
    val q = vdf.filter(col("vec_id") === 1)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val out = Similarity.bruteForceTopK(vdf, q, "vec_id", "embedding", "query_id", "qvec", k = 3)
      .orderBy("rank").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(4L, 3L, 2L)) // 1.0, 0.707, 0.0
    assert(out.map(_.getInt(3)).toSeq == Seq(1, 2, 3))
  }

  test("blockedCosinePairs respects blocks and threshold") {
    val out = Similarity.blockedCosinePairs(vdf, "vec_id", "embedding", "label", 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 3L), (2L, 3L))) // (1,4) crosses blocks; (1,2) below threshold
  }

  test("ivfTopK: nprobe covering all centroids reproduces exact top-k") {
    val q = vdf.filter(col("vec_id") === 1)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val exact = Similarity.bruteForceTopK(vdf, q, "vec_id", "embedding", "query_id", "qvec", 3)
      .orderBy("rank").collect().map(_.getLong(1)).toSeq
    // centroids = ids 1 and 2; probing both lists covers the corpus
    val ivf = Similarity.ivfTopK(vdf, q, "vec_id", "embedding", "query_id", "qvec",
      k = 3, centroidFilter = col("vec_id") <= 2, nprobe = 2)
      .orderBy("rank").collect().map(_.getLong(1)).toSeq
    assert(ivf == exact)
  }

  test("ivfTopKKMeans: spark.ml-built centroids, full probe reproduces exact top-k") {
    val q = vdf.filter(col("vec_id") === 1)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val exact = Similarity.bruteForceTopK(vdf, q, "vec_id", "embedding", "query_id", "qvec", 3)
      .orderBy("rank").collect().map(_.getLong(1)).toSeq
    val ivf = Similarity.ivfTopKKMeans(vdf, q, "vec_id", "embedding", "query_id", "qvec",
      k = 3, numCentroids = 2, nprobe = 2)
      .orderBy("rank").collect().map(_.getLong(1)).toSeq
    assert(ivf == exact)
  }

  test("cosineDedup drops larger ids of over-threshold pairs within block") {
    val out = Similarity.cosineDedup(vdf, "vec_id", "embedding", "label", 0.5)
      .select("vec_id").as[Long].collect().toSet
    // within label a: (1,3) and (2,3) ≥ .707 → 3 dropped; 4 alone in b
    assert(out == Set(1L, 2L, 4L))
  }

  test("lshTopK: same bucket ⇒ scored; signature deterministic") {
    val sigs = vdf.select(col("vec_id"), Similarity.lshSignature(col("embedding"), 8).as("sig"))
      .as[(Long, Int)].collect().toMap
    assert(sigs == vdf.select(col("vec_id"), Similarity.lshSignature(col("embedding"), 8).as("s"))
      .as[(Long, Int)].collect().toMap)
    // parallel vectors share all hyperplane signs
    assert(sigs(1L) == sigs(4L))
  }

  test("adaptiveNBits: exact integer ladder, clamped to [min, max]") {
    // largest b with n >= 128·2^b, floor 4, cap 24 (16 through r14 —
    // the sf100 probe measured the saturated cap directly: bucket
    // size 763 instead of ~128, v3 decade exponent 1.78)
    assert(Similarity.adaptiveNBits(0) == 4)
    assert(Similarity.adaptiveNBits(500) == 4)
    assert(Similarity.adaptiveNBits(4095) == 4)
    assert(Similarity.adaptiveNBits(4096) == 5) // boundary exact: 128·2^5
    assert(Similarity.adaptiveNBits(20000) == 7)
    assert(Similarity.adaptiveNBits(200000) == 10)
    assert(Similarity.adaptiveNBits(5000000) == 15)  // sf10
    assert(Similarity.adaptiveNBits(50000000) == 18) // sf100: uncapped now
    assert(Similarity.adaptiveNBits(Long.MaxValue) == 24)
    // expected bucket size stays in [128, 256) between tier boundaries
    for (n <- Seq(4096L, 8000L, 100000L, 1000000L, 50000000L)) {
      val b = Similarity.adaptiveNBits(n)
      if (b < 24) assert(n / (1L << b) >= 128 && n / (1L << b) < 256, s"n=$n b=$b")
    }
  }

  test("multiProbeMasks: identity + hamming-1 + hamming-2, all distinct") {
    assert(Similarity.multiProbeMasks(4, 0) == Seq(0))
    assert(Similarity.multiProbeMasks(4, 1).toSet == Set(0, 1, 2, 4, 8))
    val m2 = Similarity.multiProbeMasks(4, 2)
    assert(m2.size == 1 + 4 + 6 && m2.distinct == m2)
    assert(m2.forall(m => Integer.bitCount(m) <= 2))
    assert(Similarity.multiProbeMasks(16, 2).size == 1 + 16 + 120)
  }

  test("lshMultiProbeTopK: hamming-0 equals single-probe lshTopK; recall never below it") {
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val q = e.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val bits = Similarity.adaptiveNBits(e.count())
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val single = asSet(Similarity.lshTopK(e, q, "vec_id", "embedding", "query_id", "qvec", 10, bits))
    val mp0 = asSet(Similarity.lshMultiProbeTopK(e, q, "vec_id", "embedding", "query_id", "qvec",
      10, bits, probeHamming = 0))
    assert(mp0 == single, "hamming-0 multi-probe must degenerate to single-probe")
    // recall@10 vs exact ground truth: the probe superset can only help
    val exact = asSet(Similarity.bruteForceTopK(e, q, "vec_id", "embedding", "query_id", "qvec", 10))
    val mp2 = asSet(Similarity.lshMultiProbeTopK(e, q, "vec_id", "embedding", "query_id", "qvec",
      10, bits, probeHamming = 2))
    val rSingle = (single & exact).size.toDouble / exact.size
    val rMp2 = (mp2 & exact).size.toDouble / exact.size
    assert(rMp2 >= rSingle, s"multi-probe recall $rMp2 < single-probe $rSingle")
    assert(rMp2 >= 0.5, s"hamming-2 recall unexpectedly low: $rMp2")
    // radius 3 (the top of the dial): a further probe superset — recall
    // monotone again, and the mask count is exactly 1 + b + C(b,2) + C(b,3)
    val mp3 = asSet(Similarity.lshMultiProbeTopK(e, q, "vec_id", "embedding", "query_id", "qvec",
      10, bits, probeHamming = 3))
    val rMp3 = (mp3 & exact).size.toDouble / exact.size
    assert(rMp3 >= rMp2, s"hamming-3 recall $rMp3 < hamming-2 $rMp2")
    val b = 8
    assert(Similarity.multiProbeMasks(b, 3).size == 1 + b + 28 + 56)
    assert(Similarity.multiProbeMasks(b, 3).forall(m => Integer.bitCount(m) <= 3))
    intercept[IllegalArgumentException] { Similarity.multiProbeMasks(b, 4) }
  }

  test("native srp signature kernel is bit-identical to the HOF formulation") {
    for (salt <- Seq(0, 1, 3)) {
      val both = vdf.select(
        col("vec_id"),
        Similarity.lshSignature(col("embedding"), 16, salt).as("fast"),
        Similarity.lshSignatureHof(col("embedding"), 16, salt).as("hof"))
      both.collect().foreach(r =>
        assert(r.getInt(1) == r.getInt(2), s"salt=$salt id=${r.getLong(0)}"))
    }
    // different salts give independent tables (some signature differs)
    val s0 = vdf.select(Similarity.lshSignature(col("embedding"), 16, 0)).as[Int].collect().toSeq
    val s1 = vdf.select(Similarity.lshSignature(col("embedding"), 16, 1)).as[Int].collect().toSeq
    assert(s0 != s1)
  }

  test("lshCosinePairs: full-corpus blocking, exact precision, parallel pair found") {
    val pairs = Similarity.lshCosinePairs(vdf, "vec_id", "embedding", 0.5, nBits = 8, tables = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // verified precision: every emitted pair really is ≥ threshold
    assert(pairs.forall(_._3 >= 0.5))
    // no duplicates across tables (first-table emission)
    val ids = pairs.map(p => (p._1, p._2)).toSeq
    assert(ids.distinct == ids)
    // parallel vectors share every signature → always a candidate pair
    assert(ids.contains((1L, 4L)))
    // subset of the brute-force truth
    val truth = vdf.as("x").crossJoin(vdf.as("y"))
      .filter(col("x.vec_id") < col("y.vec_id"))
      .withColumn("sim", Similarity.cosine(col("x.embedding"), col("y.embedding")))
      .filter(col("sim") >= 0.5)
      .select(col("x.vec_id"), col("y.vec_id")).as[(Long, Long)].collect().toSet
    assert(ids.toSet.subsetOf(truth))
  }

  test("semanticDecontaminate: corpus vectors near any eval vector drop; others keep") {
    // eval = vector 1 ([1,0,0]); corpus holds its parallel twin (4),
    // an orthogonal vector (2) and a 45° vector (3, cos ≈ 0.707).
    val eval = vdf.filter(col("vec_id") === 1L)
      .select(col("vec_id").as("eval_id"), col("embedding").as("evec"))
    val corpus = vdf.filter(col("vec_id") =!= 1L)
    val keptHigh = Similarity.semanticDecontaminate(
      corpus, eval, "vec_id", "embedding", "eval_id", "evec",
      threshold = 0.9, nBits = 4, tables = 8)
      .select("vec_id").as[Long].collect().toSet
    // parallel twin (sim 1.0, identical signatures in every table) out
    assert(keptHigh == Set(2L, 3L))
    val keptLow = Similarity.semanticDecontaminate(
      corpus, eval, "vec_id", "embedding", "eval_id", "evec",
      threshold = 0.5, nBits = 1, tables = 8)
      .select("vec_id").as[Long].collect().toSet
    // at 0.5 with 1-bit buckets (near-total recall) the 45° vector
    // also collides and drops; the orthogonal one survives
    assert(keptLow == Set(2L))
    // eval rows never appear in the output
    assert(!(keptHigh contains 1L) && !(keptLow contains 1L))
  }

  test("lshCosineDedup: keep-min-id survivors without a blocking column") {
    val out = Similarity.lshCosineDedup(vdf, "vec_id", "embedding", 0.9, nBits = 4, tables = 4)
      .select("vec_id").as[Long].collect().toSet
    // (1,4) are parallel (sim 1.0) and always collide → 4 dropped; at
    // 0.9 no other pair qualifies, so survivors are exactly 1,2,3.
    assert(out == Set(1L, 2L, 3L))
  }

  test("int8 quantization: per-element error ≤ 0.5/scale, zero vector is a no-op") {
    val df = Seq(
      (1L, Seq(0.8f, -0.4f, 0.123f, -0.001f)),
      (2L, Seq(0.0f, 0.0f, 0.0f, 0.0f)),
    ).toDF("vec_id", "embedding")
      .withColumn("_scale", Similarity.int8Scale(col("embedding")))
      .withColumn("_q", Similarity.quantizeInt8(col("embedding"), col("_scale")))
      .withColumn("_dq", Similarity.dequantizeInt8(col("_q"), col("_scale")))
    val rows = df.orderBy("vec_id").collect()
    val scale = rows(0).getDouble(2)
    assert(math.abs(scale - 127.0 / 0.8f.toDouble) < 1e-12)
    val q = rows(0).getSeq[Int](3)
    assert(q.forall(v => v >= -127 && v <= 127))
    val orig = rows(0).getSeq[Float](1).map(_.toDouble)
    val dq = rows(0).getSeq[Double](4)
    orig.zip(dq).foreach { case (o, d) => assert(math.abs(o - d) <= 0.5 / scale + 1e-12) }
    // zero vector: scale 1, quantized to zeros, round-trips to zeros
    assert(rows(1).getDouble(2) == 1.0)
    assert(rows(1).getSeq[Int](3).forall(_ == 0))
  }

  test("quantizedRerankTopK: candidateK covering the corpus reproduces exact top-k") {
    val qs = vdf.filter(col("vec_id") === 1)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val exact = Similarity.bruteForceTopK(vdf, qs, "vec_id", "embedding", "query_id", "qvec", 3)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
    val rr = Similarity.quantizedRerankTopK(vdf, qs, "vec_id", "embedding", "query_id", "qvec",
      k = 3, candidateK = 10)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
    // with every corpus vector a candidate, the exact re-rank IS the
    // exact top-k — sims included (full precision, not quantized)
    assert(rr === exact)
  }

  test("quantizedTopK: same candidate ranking as exact top-k on separated vectors") {
    val qs = vdf.filter(col("vec_id") === 1)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val exact = Similarity.bruteForceTopK(vdf, qs, "vec_id", "embedding", "query_id", "qvec", k = 3)
      .orderBy("rank").select("vec_id").as[Long].collect().toSeq
    val quant = Similarity.quantizedTopK(vdf, qs, "vec_id", "embedding", "query_id", "qvec", k = 3)
      .orderBy("rank").select("vec_id").as[Long].collect().toSeq
    // int8 error (~4e-3 on unit-ish vectors) cannot reorder the
    // well-separated fixture sims — identical ranking
    assert(quant === exact)
    // and the quantized sims are within 2e-2 of exact
    val es = Similarity.bruteForceTopK(vdf, qs, "vec_id", "embedding", "query_id", "qvec", 3)
      .orderBy("rank").select("sim").as[Double].collect()
    val ws = Similarity.quantizedTopK(vdf, qs, "vec_id", "embedding", "query_id", "qvec", 3)
      .orderBy("rank").select("sim").as[Double].collect()
    es.zip(ws).foreach { case (e, w) => assert(math.abs(e - w) < 2e-2) }
  }

  test("semDedup: in-cluster near-dups drop keep-min-id; cross-cluster pairs survive") {
    val df = Seq(
      (1L, Array(1.0f, 0.05f, 0.0f), "x"), // cluster 0
      (2L, Array(1.0f, 0.0f, 0.0f), "x"),  // cluster 0, near-dup of 1 → dropped
      (3L, Array(0.05f, 1.0f, 0.0f), "x"), // cluster 1
      (4L, Array(0.0f, 1.0f, 0.0f), "x"),  // cluster 1, near-dup of 3 → dropped
    ).toDF("vec_id", "embedding", "label")
    val cents = Seq((0, Seq(1.0, 0.0, 0.0)), (1, Seq(0.0, 1.0, 0.0)))
    val out = Similarity.semDedup(df, "vec_id", "embedding", cents, threshold = 0.95)
      .select("vec_id").as[Long].collect().toSet
    assert(out == Set(1L, 3L))
    // output schema is the input's — the cluster column does not leak
    assert(Similarity.semDedup(df, "vec_id", "embedding", cents, 0.95).columns.toSeq
      == df.columns.toSeq)
  }

  test("semDedup with a single centroid equals unblocked cosineDedup") {
    val one = Seq((0, Seq(1.0, 0.0, 0.0)))
    val sem = Similarity.semDedup(vdf, "vec_id", "embedding", one, 0.7)
      .select("vec_id").as[Long].collect().toSet
    val flat = Similarity
      .cosineDedup(vdf.withColumn("blk", lit(1)), "vec_id", "embedding", "blk", 0.7)
      .select("vec_id").as[Long].collect().toSet
    assert(sem == flat)
    // clustering only ever BLOCKS pairs: survivors are a superset of
    // the unblocked dedup's for any centroid set
    val two = Seq((0, Seq(1.0, 0.0, 0.0)), (1, Seq(0.0, 1.0, 0.0)))
    val clustered = Similarity.semDedup(vdf, "vec_id", "embedding", two, 0.7)
      .select("vec_id").as[Long].collect().toSet
    assert(flat.subsetOf(clustered))
  }

  test("semDedup caps per-cluster work: oversized clusters verify against the min-id rep only") {
    // cluster 0 (centroid (1,0,0)): ids 1..10 are near-dups of the
    // min-id representative; 11 and 12 are near-dups of EACH OTHER
    // (cos ≈ 0.99998) but only 0.6-similar to the representative.
    // cluster 1 (centroid (0,0,1)): two near-dups, under the cap.
    val hot = (1L to 10L).map(i => (i, Array(1.0f, (i * 1e-3).toFloat, 0.0f), "x"))
    val offAxis = Seq(
      (11L, Array(0.6f, 0.8f, 0.0f), "x"),
      (12L, Array(0.6f, 0.81f, 0.0f), "x"))
    val cold = Seq(
      (20L, Array(0.0f, 0.001f, 1.0f), "x"),
      (21L, Array(0.0f, 0.002f, 1.0f), "x"))
    val df = (hot ++ offAxis ++ cold).toDF("vec_id", "embedding", "label")
    val cents = Seq((0, Seq(1.0, 0.0, 0.0)), (1, Seq(0.0, 0.0, 1.0)))
    // cluster 0 has 12 members > cap 8 → linear representative path:
    // 2..10 drop (≈1.0 vs rep 1); 11 and 12 BOTH survive (0.6 vs rep)
    // despite being near-dups of each other — the distinguisher that
    // proves the all-pairs self-join did NOT run on the oversized
    // cluster. cluster 1 (2 ≤ cap) keeps exact pairwise: 21 drops.
    val capped = Similarity
      .semDedup(df, "vec_id", "embedding", cents, 0.9, maxClusterSize = 8)
      .select("vec_id").as[Long].collect().toSet
    assert(capped == Set(1L, 11L, 12L, 20L))
    // cap above the cluster size → the paper's exact all-pairs
    // semantics return: 12 drops against 11
    val exact = Similarity
      .semDedup(df, "vec_id", "embedding", cents, 0.9, maxClusterSize = 100)
      .select("vec_id").as[Long].collect().toSet
    assert(exact == Set(1L, 11L, 20L))
  }

  test("semDedup skewed fixture: 80% hot cluster collapses linearly under the cap") {
    // The adversarial SemDeDup corpus: 80% of 2000 embeddings are
    // near-identical and land in ONE cluster. Capped at 64, each
    // oversized cluster contributes n−1 verified candidates (the
    // unbounded all-pairs join would enumerate ~1.28M pairs on one
    // shuffle key). Both clusters are tight near-dup blobs, so the
    // linear form collapses each onto its min-id representative.
    val n = 2000
    val rows = (0 until n).map { i =>
      if (i % 5 != 0) (i.toLong, Array(1.0f, (i * 1e-4).toFloat, 0.0f), "x")
      else (i.toLong, Array(0.0f, 1.0f, (i * 1e-4).toFloat), "x")
    }
    val df = rows.toDF("vec_id", "embedding", "label")
    val cents = Seq((0, Seq(1.0, 0.0, 0.0)), (1, Seq(0.0, 1.0, 0.0)))
    graft.quality.SkewTelemetry.reset()
    val out = Similarity
      .semDedup(df, "vec_id", "embedding", cents, 0.9, maxClusterSize = 64)
      .select("vec_id").as[Long].collect().toSet
    assert(out == Set(0L, 1L)) // min id of each cluster
    // the fall-through is observable: both oversized clusters are
    // counted and the declined pair volume is reported (async listener)
    val deadline = System.currentTimeMillis() + 15000
    var ev = graft.quality.SkewTelemetry.lastEvent
    while (ev.isEmpty && System.currentTimeMillis() < deadline) {
      Thread.sleep(50)
      ev = graft.quality.SkewTelemetry.lastEvent
    }
    assert(ev.nonEmpty, "no skew observation arrived within 15s")
    assert(ev.get.metric.contains("semdedup"))
    assert(ev.get.oversizedBuckets == 2)
    assert(ev.get.maxBucketSize == 1600)
    assert(ev.get.skippedPairs > 0)
  }

  test("seedCentroids: deterministic id-ordered selection, cap applies") {
    val cents = Similarity.seedCentroids(vdf, "vec_id", "embedding",
      col("vec_id") =!= 2, maxCentroids = 2)
    assert(cents.map(_._1) == Seq(0, 1)) // dense re-indexed cids
    assert(cents.map(_._2) == Seq(Seq(1.0, 0.0, 0.0), Seq(1.0, 1.0, 0.0))) // ids 1, 3
  }

  test("clusterBalancedSample: per-cluster budget, tail kept whole, deterministic") {
    val rows = (0L until 60L).map { i =>
      // 50 x-dominant vectors (dense head cluster), 10 y-dominant (tail)
      if (i < 50) (i, Array(1.0f, (i % 7).toFloat / 100f, 0.0f))
      else (i, Array(0.0f, 1.0f, (i % 3).toFloat / 100f))
    }.toDF("vec_id", "embedding")
    val cents = Seq((0, Seq(1.0, 0.0, 0.0)), (1, Seq(0.0, 1.0, 0.0)))
    val kept = Similarity
      .clusterBalancedSample(rows, "vec_id", "embedding", cents, perClusterBudget = 12, salt = "s")
      .select("vec_id", "cluster_id").as[(Long, Int)].collect()
    val byCluster = kept.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byCluster(0) == 12) // head capped at budget
    assert(byCluster(1) == 10) // tail cluster survives whole
    // assignment is the nearest-centroid rule
    kept.foreach { case (id, cid) => assert(cid == (if (id < 50) 0 else 1)) }
    // deterministic: same salt → same set; budget >= cluster sizes → identity
    val again = Similarity
      .clusterBalancedSample(rows, "vec_id", "embedding", cents, perClusterBudget = 12, salt = "s")
      .select("vec_id").as[Long].collect().toSet
    assert(again == kept.map(_._1).toSet)
    val all = Similarity
      .clusterBalancedSample(rows, "vec_id", "embedding", cents, perClusterBudget = 60, salt = "s")
    assert(all.count() == 60)
  }

  private def pqdf = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f, 1.0f)),
    (2L, Array(0.0f, 1.0f, 1.0f, 0.0f)),
    (3L, Array(1.0f, 1.0f, 0.0f, 0.0f)),
    (4L, Array(0.9f, 0.1f, 0.1f, 0.9f)), // near 1
    (5L, Array(0.1f, 0.9f, 0.9f, 0.1f)), // near 2
  ).toDF("vec_id", "embedding")

  test("pqCodebooks: dense cid-ordered per-subspace codebooks, deterministic") {
    val cb = Similarity.pqCodebooks(pqdf, "embedding", m = 2, subDim = 2, ksub = 2)
    assert(cb.map(_._1).distinct == Seq(0, 1))
    assert(cb.filter(_._1 == 0).map(_._2) == Seq(0, 1)) // dense, ordered
    assert(cb.forall(_._3.length == 2))
    val again = Similarity.pqCodebooks(pqdf, "embedding", m = 2, subDim = 2, ksub = 2)
    assert(cb == again) // fixed seed, fixed sample -> identical index
  }

  test("pqEncode: argmin squared-L2 per subspace, ties break to the lower cid") {
    // hand-built codebooks: subspace 0 separates x-dominant from
    // y-dominant; subspace 1 has two IDENTICAL centroids (tie)
    val cb = Seq(
      (0, 0, Seq(1.0, 0.0)), (0, 1, Seq(0.0, 1.0)),
      (1, 0, Seq(0.5, 0.5)), (1, 1, Seq(0.5, 0.5)))
    val codes = Similarity.pqEncode(pqdf, "embedding", cb, subDim = 2)
      .select(col("vec_id"), col("pq_code")).as[(Long, Seq[Int])]
      .collect().toMap
    assert(codes(1L) == Seq(0, 0)) // (1,0) -> cid 0; tie -> cid 0
    assert(codes(2L) == Seq(1, 0))
    assert(codes(4L) == Seq(0, 0))
    assert(codes(5L) == Seq(1, 0))
  }

  test("pqRerankTopK: candidateK covering the corpus reproduces exact top-k") {
    val q = pqdf.filter(col("vec_id") <= 2)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val cb = Similarity.pqCodebooks(pqdf, "embedding", m = 2, subDim = 2, ksub = 2)
    val exact = Similarity
      .bruteForceTopK(pqdf, q, "vec_id", "embedding", "query_id", "qvec", k = 3)
      .orderBy("query_id", "rank").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val pq = Similarity
      .pqRerankTopK(pqdf, q, "vec_id", "embedding", "query_id", "qvec",
        k = 3, candidateK = 10, cb, subDim = 2)
      .orderBy("query_id", "rank").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pq == exact)
  }

  test("pq ADC proposal ranks the structurally-nearest neighbor first") {
    // ksub = 4 on 5 vectors: codebooks nearly memorize the corpus, so
    // the ADC proposal alone should put 4 (near-parallel to 1) at the
    // top for query 1 even before the exact rerank
    val q = pqdf.filter(col("vec_id") === 1)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val cb = Similarity.pqCodebooks(pqdf, "embedding", m = 2, subDim = 2, ksub = 4)
    val top = Similarity
      .pqRerankTopK(pqdf, q, "vec_id", "embedding", "query_id", "qvec",
        k = 1, candidateK = 1, cb, subDim = 2)
      .collect()
    assert(top.length == 1 && top(0).getLong(1) == 4L)
  }

  test("ivfPqTopK: full probes + covering candidateK reproduce exact top-k") {
    val q = pqdf.filter(col("vec_id") <= 2)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val cents = Similarity.seedCentroids(pqdf, "vec_id", "embedding",
      col("vec_id") <= 2, maxCentroids = 2)
    val cb = Similarity.pqCodebooks(pqdf, "embedding", m = 2, subDim = 2, ksub = 4)
    val exact = Similarity
      .bruteForceTopK(pqdf, q, "vec_id", "embedding", "query_id", "qvec", k = 3)
      .orderBy("query_id", "rank").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val ivfpq = Similarity
      .ivfPqTopK(pqdf, q, "vec_id", "embedding", "query_id", "qvec",
        k = 3, candidateK = 10, cents, nprobe = 2, cb, subDim = 2)
      .orderBy("query_id", "rank").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(ivfpq == exact)
  }

  test("ivfPqTopK: nprobe = 1 restricts candidates to the query's own cell") {
    // centroids = vectors 1 and 2 (orthogonal); every corpus vector
    // assigns to its nearer seed, so with one probe a query only sees
    // same-cell neighbors: query 1 must pick 4, never 5
    val q = pqdf.filter(col("vec_id") === 1)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val cents = Similarity.seedCentroids(pqdf, "vec_id", "embedding",
      col("vec_id") <= 2, maxCentroids = 2)
    val cb = Similarity.pqCodebooks(pqdf, "embedding", m = 2, subDim = 2, ksub = 4)
    val got = Similarity
      .ivfPqTopK(pqdf, q, "vec_id", "embedding", "query_id", "qvec",
        k = 5, candidateK = 10, cents, nprobe = 1, cb, subDim = 2)
      .collect().map(r => r.getLong(1)).toSet
    assert(got.contains(4L) && !got.contains(5L) && !got.contains(2L))
  }
}
