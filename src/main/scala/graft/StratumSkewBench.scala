package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.text.Sampling

/** Measured skew points for the two-pass stratum-window pairs —
  * tp10's topFractionByScore vs topFractionByScoreBucketed and tp7's
  * tokenBudgetSample vs tokenBudgetSampleBucketed — in the same
  * protocol as [[CapSkewBench]] (the committed numbers behind the
  * bucketed variants' scaladoc claims).
  *
  * Method: a synthesized corpus where ONE stratum owns 30% of all rows
  * (deterministic pmod routing, scratch parquet, read back). Both
  * plain forms pay a full per-stratum sort that CANNOT be
  * WindowGroupLimit-pruned (the fraction/budget cut needs every row's
  * rank / running sum), so the hot stratum serializes into one reducer
  * task; the bucketed forms spread it over score-range / hash-range
  * buckets and merge tiny per-bucket offsets. Outputs are compared
  * (row count + order-free checksum over every column) so the ratio
  * prices a proven-identical answer.
  *
  * Usage: tools/runmain.sh graft.StratumSkewBench [reps] [nRows]
  */
object StratumSkewBench {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val nRows = args.lift(1).map(_.toLong).getOrElse(20000000L)
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
      .createTempDirectory("graft-stratumskew").resolve("docs").toString
    spark.range(0, nRows)
      .select(
        col("id").as("doc_id"),
        when(pmod(col("id"), lit(100)) < hotPct, lit(HotDomain))
          .otherwise(concat(lit("domain-"), pmod(col("id"), lit(nDomains))))
          .as("domain"),
        (pmod(col("id") * lit(2654435761L), lit(1000000L)) / 1000.0).as("score"),
        pmod(col("id") * lit(976369L), lit(1000L)).as("toks"))
      .write.mode("overwrite").parquet(dir)
    val docs = spark.read.parquet(dir)
    val totalRows = docs.count()
    val hotRows = docs.filter(col("domain") === HotDomain).count()

    // budgets sized to genuinely cut (~50% of each stratum's weight):
    // mean toks ≈ 500, cold stratum ≈ nRows·0.7/2000 rows, hot = 30%
    val coldBudget = (nRows * 0.7 / nDomains * 500 / 2).toLong
    val hotBudget = (hotRows * 500L) / 2

    def tfPlain() = Sampling.topFractionByScore(
      docs, col("domain"), col("score"), col("doc_id"), fraction = 0.5)
    def tfBucketed() = Sampling.topFractionByScoreBucketed(
      docs, col("domain"), col("score"), col("doc_id"), fraction = 0.5)
    def tbPlain() = Sampling.tokenBudgetSample(
      docs, col("doc_id"), col("domain"), col("toks"),
      Map(HotDomain -> hotBudget), defaultBudget = coldBudget, salt = "sk")
    def tbBucketed() = Sampling.tokenBudgetSampleBucketed(
      docs, col("doc_id"), col("domain"), col("toks"),
      Map(HotDomain -> hotBudget), defaultBudget = coldBudget, salt = "sk")

    def checksum(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val h = df.select(xxhash64(df.columns.map(col): _*).as("h"))
        .agg(count(lit(1)).as("n"), sum(col("h")).as("s")).head()
      (h.getLong(0), h.getLong(1))
    }
    val tfP = checksum(tfPlain())
    val tfB = checksum(tfBucketed())
    require(tfP == tfB, s"topFraction bucketed != plain on the skewed corpus: $tfP vs $tfB")
    val tbP = checksum(tbPlain())
    val tbB = checksum(tbBucketed())
    require(tbP == tbB, s"tokenBudget bucketed != plain on the skewed corpus: $tbP vs $tbB")

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
    // warm pass each, then timed best-of-reps
    Seq(tfPlain _, tfBucketed _, tbPlain _, tbBucketed _).foreach(f =>
      f().write.mode("overwrite").format("noop").save())
    spark.catalog.clearCache()
    val tfPlainSec = time(tfPlain)
    val tfBucketedSec = time(tfBucketed)
    val tbPlainSec = time(tbPlain)
    val tbBucketedSec = time(tbBucketed)

    def f2(v: Double) = "%.2f".formatLocal(java.util.Locale.ROOT, v)
    val line =
      s"""{"metric":"stratum_window_skew","total_rows":$totalRows,""" +
        s""""hot_stratum_rows":$hotRows,""" +
        s""""topfraction_plain_sec":${f2(tfPlainSec)},"topfraction_bucketed_sec":${f2(tfBucketedSec)},""" +
        s""""topfraction_plain_over_bucketed":${f2(tfPlainSec / tfBucketedSec)},""" +
        s""""budget_plain_sec":${f2(tbPlainSec)},"budget_bucketed_sec":${f2(tbBucketedSec)},""" +
        s""""budget_plain_over_bucketed":${f2(tbPlainSec / tbBucketedSec)},""" +
        s""""outputs_identical":true,"topfraction_rows":${tfP._1},"budget_rows":${tbP._1},"reps":$reps}"""
    println(line)
    sys.env.get("SPARK_GRAFT_STRATUMSKEW_OUT").foreach { p =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(p),
        (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    spark.stop()
  }
}
