package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.text.Sampling

/** Measured skew point for the per-stratum cap pair (tp14's
  * capPerStratum plain vs capPerStratumBucketed) — the committed
  * number behind the bucketed variant's scaladoc claim, in the same
  * protocol as SkewBench's sessionize point.
  *
  * Method: a synthesized corpus where ONE domain owns 30% of all rows
  * (the SkewBench constants: deterministic pmod routing, scratch
  * parquet, read back) and the cap is large relative to any single
  * map partition's hot-domain slice — the regime where the plain
  * form's map-side WindowGroupLimit prunes NOTHING (every local
  * top-cap keeps everything) and its final reducer receives and sorts
  * the hot domain's entire row set in one task. The bucketed variant
  * spreads that set over `saltBuckets` level-1 reducers and re-caps
  * the bounded survivors. Outputs are compared (row count +
  * order-free checksum over every column) so the ratio prices a
  * proven-identical answer.
  *
  * The small-cap regime is deliberately NOT the one measured: there
  * the plain form's map-side pruning already bounds the reducer at
  * cap × mapPartitions and both variants are fast — the bucketed
  * form's reason to exist is cap × P outgrowing a task at wide-P
  * (or, equivalently locally, cap outgrowing the per-partition hot
  * slice).
  *
  * Usage: tools/runmain.sh graft.CapSkewBench [reps] [nRows] [cap]
  */
object CapSkewBench {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val nRows = args.lift(1).map(_.toLong).getOrElse(40000000L)
    val cap = args.lift(2).map(_.toInt).getOrElse(100000)
    val cpus = Defaults.cpus
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val hotPct = 30
    val nDomains = 2000L
    val HotDomain = "domain-hot"
    val dir = java.nio.file.Files
      .createTempDirectory("graft-capskew").resolve("docs").toString
    spark.range(0, nRows)
      .select(
        col("id").as("doc_id"),
        when(pmod(col("id"), lit(100)) < hotPct, lit(HotDomain))
          .otherwise(concat(lit("domain-"), pmod(col("id"), lit(nDomains))))
          .as("domain"),
        (pmod(col("id") * lit(2654435761L), lit(1000000L)) / 1000.0).as("score"))
      .write.mode("overwrite").parquet(dir)
    val docs = spark.read.parquet(dir)
    val totalRows = docs.count()
    val hotRows = docs.filter(col("domain") === HotDomain).count()

    def plain() = Sampling.capPerStratum(
      docs, col("domain"), col("score"), col("doc_id"), cap)
    def bucketed() = Sampling.capPerStratumBucketed(
      docs, col("domain"), col("score"), col("doc_id"), cap)

    def checksum(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val h = df.select(xxhash64(df.columns.map(col): _*).as("h"))
        .agg(count(lit(1)).as("n"), sum(col("h")).as("s")).head()
      (h.getLong(0), h.getLong(1))
    }
    val cp = checksum(plain())
    val cb = checksum(bucketed())
    require(cp == cb, s"bucketed != plain on the skewed corpus: $cp vs $cb")

    def time(f: () => org.apache.spark.sql.DataFrame): Double = {
      var best = Double.MaxValue
      for (_ <- 0 until reps) {
        val t0 = System.nanoTime()
        f().write.mode("overwrite").format("noop").save()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
        spark.catalog.clearCache()
      }
      best
    }
    plain().write.mode("overwrite").format("noop").save()
    bucketed().write.mode("overwrite").format("noop").save()
    spark.catalog.clearCache()
    val plainSec = time(plain)
    val bucketedSec = time(bucketed)

    def f2(v: Double) = "%.2f".formatLocal(java.util.Locale.ROOT, v)
    val line =
      s"""{"metric":"domain_cap_skew","total_rows":$totalRows,""" +
        s""""hot_domain_rows":$hotRows,"cap":$cap,""" +
        s""""plain_sec":${f2(plainSec)},"bucketed_sec":${f2(bucketedSec)},""" +
        s""""plain_over_bucketed":${f2(plainSec / bucketedSec)},""" +
        s""""outputs_identical":true,"kept_rows":${cp._1},"reps":$reps}"""
    println(line)
    sys.env.get("SPARK_GRAFT_CAPSKEW_OUT").foreach { p =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(p),
        (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    spark.stop()
  }
}
