package graft.sim

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The persisted, refresh-maintained IVF index (VERDICT r15 ask 1):
  * build/reuse/staleness semantics, full-probe ≡ exact on the
  * persisted serve paths, and the scale-adaptive centroid ladder. */
class IvfIndexSpec extends SparkSpec {
  import spark.implicits._

  // 40 vectors in 4 tight directional clumps (dim 8) — KMeans at k=4
  // separates them; unit-ish norms keep cosines well-spread.
  private def corpus = {
    val rows = (0 until 40).map { i =>
      val c = i % 4
      val base = Array.fill(8)(0.05f)
      base(c * 2) = 1.0f
      base(c * 2 + 1) = 0.2f + 0.01f * (i / 4)
      (i.toLong, base)
    }
    rows.toDF("vec_id", "embedding")
  }

  private def queries =
    corpus.filter(col("vec_id") % 7 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))

  private def freshWarehouse(): String =
    java.nio.file.Files.createTempDirectory("graft-ivfindex-spec").toString

  private val p = IvfIndex.Params(
    targetList = 8L, minBits = 1, maxBits = 4, minSampleRows = 64,
    pq = Some(IvfIndex.PqParams(m = 4, subDim = 2, ksub = 4)))

  test("centroidCount follows the adaptiveNBits ladder (occupancy in [target, 2·target))") {
    val pp = IvfIndex.Params(targetList = 16L, minBits = 2, maxBits = 12)
    assert(IvfIndex.centroidCount(500L, pp) == 16)   // 500/16 = 31.25
    assert(IvfIndex.centroidCount(2000L, pp) == 64)  // 2000/64 = 31.25
    assert(IvfIndex.centroidCount(1L, pp) == 4)      // floor at minBits
    // cap: bits never exceed maxBits even at huge n
    assert(IvfIndex.centroidCount(Long.MaxValue / 4, pp) == 4096)
    // every realized occupancy sits in [target, 2*target) below the caps
    for (n <- Seq(2048L, 5000L, 100000L, 1000000L)) {
      val k = IvfIndex.centroidCount(n, pp)
      if (k < 4096 && k > 4) assert(n / k >= 16 && n / k < 32, s"occupancy off at n=$n k=$k")
    }
  }

  test("ensure publishes all tables, meta last; second ensure reuses without rebuild") {
    val wh = freshWarehouse()
    val h = IvfIndex.ensure(spark, wh, "ix", corpus, "vec_id", "embedding", p)
    assert(h.k == IvfIndex.centroidCount(40L, p))
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    for (path <- Seq(h.centroidsPath, h.cellsPath, h.codebooksPath, h.codesPath, h.metaPath))
      assert(fs.exists(new org.apache.hadoop.fs.Path(path)), s"missing $path")
    // cells carry every corpus row exactly once, cell-partitioned
    val cells = IvfIndex.cells(spark, h)
    assert(cells.count() == 40L)
    assert(cells.select("vec_id").distinct().count() == 40L)
    assert(cells.columns.toSet == Set("vec_id", "embedding", "cell"))
    // codes: one m-entry code per row, every entry within [0, ksub)
    val codes = IvfIndex.codes(spark, h)
    assert(codes.count() == 40L)
    val bad = codes.filter(size(col("code")) =!= 4 ||
      exists(col("code"), c => c < 0 || c >= 4)).count()
    assert(bad == 0L)
    // reuse: the published centroid file's modification time must not
    // change across a second ensure with identical (corpus, params)
    val centDir = new org.apache.hadoop.fs.Path(h.centroidsPath)
    val t0 = fs.listStatus(centDir).map(_.getModificationTime).max
    val h2 = IvfIndex.ensure(spark, wh, "ix", corpus, "vec_id", "embedding", p)
    assert(h2.k == h.k)
    val t1 = fs.listStatus(centDir).map(_.getModificationTime).max
    assert(t0 == t1, "second ensure rebuilt a valid index")
  }

  test("ensure rebuilds on corpus growth (row-count staleness) and on param change") {
    val wh = freshWarehouse()
    val h = IvfIndex.ensure(spark, wh, "ix", corpus, "vec_id", "embedding", p)
    val grown = corpus.unionByName(
      Seq((100L, Array(0.9f, 0.1f, 0f, 0f, 0f, 0f, 0f, 0.3f))).toDF("vec_id", "embedding"))
    val h2 = IvfIndex.ensure(spark, wh, "ix", grown, "vec_id", "embedding", p)
    assert(IvfIndex.cells(spark, h2).count() == 41L, "stale index served after corpus change")
    // param change: different seed → rebuild (meta mismatch)
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val centDir = new org.apache.hadoop.fs.Path(h.centroidsPath)
    val t0 = fs.listStatus(centDir).map(_.getModificationTime).max
    IvfIndex.ensure(spark, wh, "ix", grown, "vec_id", "embedding", p.copy(seed = 7L))
    val t1 = fs.listStatus(centDir).map(_.getModificationTime).max
    assert(t1 > t0, "param change did not rebuild")
  }

  test("a torn build (no meta) is rebuilt, never served") {
    val wh = freshWarehouse()
    val h = IvfIndex.ensure(spark, wh, "ix", corpus, "vec_id", "embedding", p)
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    // simulate a crash mid-build: meta invalidated, tables half-new
    fs.delete(new org.apache.hadoop.fs.Path(h.metaPath), true)
    val h2 = IvfIndex.ensure(spark, wh, "ix", corpus, "vec_id", "embedding", p)
    assert(fs.exists(new org.apache.hadoop.fs.Path(h2.metaPath)))
    assert(IvfIndex.cells(spark, h2).count() == 40L)
  }

  test("persisted-index topK with full probe reproduces exact brute-force top-k") {
    val wh = freshWarehouse()
    val h = IvfIndex.ensure(spark, wh, "ix", corpus, "vec_id", "embedding", p)
    val exact = Similarity.bruteForceTopK(corpus, queries,
      "vec_id", "embedding", "query_id", "qvec", k = 5)
      .orderBy("query_id", "rank").collect().toSeq
    val served = IvfIndex.topK(spark, h, queries,
      "vec_id", "embedding", "query_id", "qvec", k = 5, nprobe = h.k)
      .orderBy("query_id", "rank").collect().toSeq
    assert(served == exact)
  }

  test("persisted-index semDedup matches per-call semDedup on the same centroids") {
    val wh = freshWarehouse()
    val h = IvfIndex.ensure(spark, wh, "ix", corpus, "vec_id", "embedding", p)
    val cents = IvfIndex.readCentroids(spark, h)
    val expected = Similarity.semDedup(corpus, "vec_id", "embedding", cents,
      threshold = 0.9, maxClusterSize = 6)
      .select("vec_id").as[Long].collect().toSet
    val served = IvfIndex.semDedup(spark, h, corpus, "vec_id", "embedding",
      threshold = 0.9, maxClusterSize = 6)
      .select("vec_id").as[Long].collect().toSet
    assert(served == expected)
    assert(served.nonEmpty && served.size < 40, "dedup should drop some near-dups here")
  }

  test("persisted-index pqTopK equals the per-call ivfPqTopK on the same artifacts") {
    val wh = freshWarehouse()
    val h = IvfIndex.ensure(spark, wh, "ix", corpus, "vec_id", "embedding", p)
    val cents = IvfIndex.readCentroids(spark, h)
    val cb = IvfIndex.readCodebooks(spark, h)
    val perCall = Similarity.ivfPqTopK(corpus, queries, "vec_id", "embedding",
      "query_id", "qvec", k = 3, candidateK = 10, cents, nprobe = 2, cb, subDim = 2)
      .orderBy("query_id", "rank").collect().toSeq
    val served = IvfIndex.pqTopK(spark, h, corpus, queries, "vec_id", "embedding",
      "query_id", "qvec", k = 3, candidateK = 10, nprobe = 2)
      .orderBy("query_id", "rank").collect().toSeq
    assert(served == perCall)
  }

  test("serve plan prunes the cells scan to the probed cells (DPP)") {
    // Spark's PartitionPruning rule needs two things a purely-local
    // toy plan denies it: (a) a selective Filter NODE surviving on the
    // probe side — a local relation constant-folds the filter into the
    // LocalTableScan, so the query side must be a parquet scan like
    // the real serve path; (b) a benefit estimate where the
    // partitioned cells scan dominates the probe side's size, so the
    // corpus is 2000 rows against a 21-row query table. The sf0.01
    // Probe plan shows the same dynamicpruningexpression on the cells
    // scan.
    val big = (0 until 2000).map { i =>
      val base = Array.fill(8)(0.05f)
      base((i % 4) * 2) = 1.0f
      base((i % 4) * 2 + 1) = 0.2f + 0.001f * (i / 4)
      (i.toLong, base)
    }.toDF("vec_id", "embedding")
    val wh = freshWarehouse()
    val h = IvfIndex.ensure(spark, wh, "ix", big, "vec_id", "embedding", p)
    val qDir = s"$wh/queries"
    big.filter(col("vec_id") % 97 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      .write.parquet(qDir)
    val q = spark.read.parquet(qDir).filter(col("query_id") >= 0)
    val plan = IvfIndex.topK(spark, h, q,
      "vec_id", "embedding", "query_id", "qvec", k = 3, nprobe = 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"cells scan is not DPP-pruned:\n$plan")
  }
}
