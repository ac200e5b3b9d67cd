package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sim.Similarity

import scala.util.control.NonFatal

/** ANN knob sweep — the operating CURVES behind [[AnnRecallBench]]'s
  * point measurements. The committed v-family queries pin each
  * index's arithmetic at deliberately small, oracle-replayable
  * parameters; this main varies the quality knobs those queries hold
  * fixed — probe width (multi-probe Hamming radius), nprobe, PQ
  * codebook shape, candidateK — and measures (wall, recall@10)
  * per point against the exact brute-force truth, so the
  * recall-is-a-knob claim in ARCHITECTURE.md is a measured curve,
  * not an assertion. Same protocol as AnnRecallBench: warm-up +
  * min-of-reps noop-sink timing, recall via a distributed join
  * against staged truth.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/tmp/sf1 tools/runmain.sh graft.AnnKnobBench
  * Prints ONE JSON line; folded into MEASUREMENTS_R11.json.
  */
object AnnKnobBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1")
    val reps = sys.env.get("SPARK_GRAFT_ANN_REPS").map(_.toInt).getOrElse(2)
    val cpus = Defaults.cpus
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val nVecs = e.count()
    val q = e.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))

    val truthPath = Defaults.scratchDir("graft-annk-truth") + "/truth"
    Similarity.bruteForceTopK(e, q, "vec_id", "embedding", "query_id", "qvec", k = 10)
      .select(col("query_id"), col("vec_id"))
      .write.mode("overwrite").parquet(truthPath)
    spark.catalog.clearCache()
    val truthRows = spark.read.parquet(truthPath).count().toDouble

    // Index builds once, outside the timed loop — index-build cost is
    // a separate (bounded, documented) story; the sweep prices QUERY
    // cost per quality point.
    val bits = Similarity.adaptiveNBits(nVecs)
    val cb16 = Similarity.pqCodebooks(e, "embedding", m = 4, subDim = 16, ksub = 16)
    val cb256 = Similarity.pqCodebooks(e, "embedding", m = 8, subDim = 8, ksub = 256)
    val cents16 = Similarity.seedCentroids(e, "vec_id", "embedding",
      col("vec_id") % 31 === 0, maxCentroids = 16)

    def topk(f: => DataFrame): () => DataFrame = () => f

    val points: Seq[(String, () => DataFrame)] =
      (0 to 3).map(h => s"v3_lsh_hamming$h" -> topk(
        Similarity.lshMultiProbeTopK(e, q, "vec_id", "embedding", "query_id", "qvec",
          k = 10, nBits = bits, probeHamming = h))) ++
      Seq(3, 8, 16).map(np => s"v4_ivf_nprobe$np" -> topk(
        Similarity.ivfTopK(e, q, "vec_id", "embedding", "query_id", "qvec",
          k = 10, centroidFilter = col("vec_id") % 31 === 0, nprobe = np))) ++
      Seq(50, 200, 800).map(ck => s"v12_pq_m4k16_cand$ck" -> topk(
        Similarity.pqRerankTopK(e, q, "vec_id", "embedding", "query_id", "qvec",
          k = 10, candidateK = ck, cb16, subDim = 16))) ++
      Seq(50, 200).map(ck => s"v12_pq_m8k256_cand$ck" -> topk(
        Similarity.pqRerankTopK(e, q, "vec_id", "embedding", "query_id", "qvec",
          k = 10, candidateK = ck, cb256, subDim = 8))) ++
      Seq(50, 200, 800).map(ck => s"v15_ivfpq_cand$ck" -> topk(
        Similarity.ivfPqTopK(e, q, "vec_id", "embedding", "query_id", "qvec",
          k = 10, candidateK = ck, cents16, nprobe = 4, cb16, subDim = 16))) ++
      Seq(50, 200).map(ck => s"v9_sq_cand$ck" -> topk(
        Similarity.quantizedRerankTopK(e, q, "vec_id", "embedding", "query_id", "qvec",
          k = 10, candidateK = ck)))

    def f2(v: Double) = "%.2f".formatLocal(java.util.Locale.ROOT, v)
    def f4(v: Double) = "%.4f".formatLocal(java.util.Locale.ROOT, v)

    def timeOnce(name: String, f: () => DataFrame): Option[Double] = {
      val t0 = System.nanoTime()
      val ok =
        try { f().write.mode("overwrite").format("noop").save(); true }
        catch {
          case NonFatal(ex) =>
            System.err.println(
              s"[annknob] $name FAILED: ${ex.toString.linesIterator.next().take(200)}")
            false
        }
      val sec = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      if (ok) Some(sec) else None
    }

    val blocks = points.flatMap { case (name, f) =>
      if (timeOnce(name, f).isEmpty) None
      else {
        val sec = (1 to reps).flatMap(_ => timeOnce(name, f)).min
        val hits = f()
          .select(col("query_id"), col("vec_id"))
          .join(spark.read.parquet(truthPath), Seq("query_id", "vec_id"))
          .count()
        spark.catalog.clearCache()
        val b = s""""$name":{"sec":${f2(sec)},"recall_at_10":${f4(hits / truthRows)}}"""
        System.err.println(s"[annknob] $b")
        Some(b)
      }
    }

    val line =
      s"""{"metric":"ann_knobs","sf":"$sfDir","n_vectors":$nVecs,""" +
        s""""n_truth_rows":${truthRows.toLong},"k":10,"reps":$reps,"lsh_bits":$bits,""" +
        s""""points":${blocks.mkString("{", ",", "}")}}"""
    println(line)
    sys.env.get("SPARK_GRAFT_ANN_OUT").foreach { p =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(p),
        (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    spark.stop()
  }
}
