package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.agg.Sessionize

/** Measured skew point for the sessionize pair (w3 plain vs w4
  * bucketed) — the number SkewTelemetry's hot-user WARN cites: the
  * WARN says "use sessionStatsBucketed", so a committed wall-time
  * ratio under real skew must back it.
  *
  * Method: a synthesized events corpus where ONE user owns 30% of
  * all rows (deterministic: every id with pmod(id, 100) < 30 goes to
  * the hot user — the `hotPct` constant below; the committed
  * MEASUREMENTS_R11 point is 12M hot rows of 40M), written to
  * scratch parquet and read back — the same on-disk shape the real
  * queries scan. Both variants run with
  * the w3/w4 parameters (6 h gap, 1-day bucket, event_id tie-break)
  * to a noop sink, min wall across reps after a warm-up pass; outputs
  * are compared (row count + order-free checksum over every column)
  * so the speedup is for a proven-identical answer.
  *
  * The plain variant's hazard is structural: the per-user window sort
  * puts the hot user's entire history in ONE task, so its wall is
  * bounded below by one core sorting 10% of the corpus. The bucketed
  * variant's stage-1 partition is (user, day) — the hot user's rows
  * spread over ~2.4K day-buckets and every core participates.
  *
  * Usage: tools/runmain.sh graft.SkewBench [sfDir] [reps]
  */
object SkewBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
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

    val HotUser = 999999942L
    // Corpus synthesized at a scale where the hazard is REAL, not
    // nominal: re-keying the sf1 events table (the round-11 first cut)
    // gave the hot user only 100K rows — a single-task sort of 100K
    // rows is microseconds, so the plain variant WON (0.50 vs 0.70 s)
    // and the measurement said nothing. The hazard is a single task
    // sorting the hot user's entire history, so the history must be
    // big enough to dominate a task: `nRows` events over one year,
    // `hotPct`% of ALL rows on ONE user (tens of millions of rows in
    // one window partition), the rest spread over `nUsers` keys.
    // Pseudo-random event times via a multiplicative-hash spread so
    // sessions form densely for the hot user and sparsely elsewhere.
    val nRows = args.lift(2).map(_.toLong).getOrElse(40000000L)
    val hotPct = 30
    val nUsers = 200000L
    val yearUs = 365L * 86400000000L
    val epoch0 = 1704067200000000L // 2024-01-01 UTC, micros
    val skewedDir = java.nio.file.Files
      .createTempDirectory("graft-skewbench").resolve("events").toString
    spark.range(0, nRows)
      .select(
        col("id").as("event_id"),
        when(pmod(col("id"), lit(100)) < hotPct, lit(HotUser))
          .otherwise(pmod(col("id"), lit(nUsers))).as("user_id"),
        timestamp_micros(
          pmod(col("id") * lit(2654435761L), lit(yearUs)) + lit(epoch0)).as("ts"),
        (pmod(col("id"), lit(1000)) / 10.0).as("value"))
      .write.mode("overwrite").parquet(skewedDir)
    val events = spark.read.parquet(skewedDir)
    val totalRows = events.count()
    val hotRows = events.filter(col("user_id") === HotUser).count()

    val gapUs = 21600000000L   // 6 h — the w3/w4 setting
    val bucketUs = 86400000000L // 1 day

    def plain() = Sessionize.sessionStats(
      events, "user_id", "ts", "value", gapUs = gapUs, tieBreak = Seq("event_id"))
    def bucketed() = Sessionize.sessionStatsBucketed(
      events, "user_id", "ts", "value", gapUs = gapUs, bucketUs = bucketUs,
      tieBreak = Seq("event_id"))

    // identical-answer check: row count + order-free checksum over
    // every output column (same comparison idea as the driver's hash
    // gate, coarse but column-complete)
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
    // warm both paths once (JIT/codegen), then interleave timed reps
    plain().write.mode("overwrite").format("noop").save()
    bucketed().write.mode("overwrite").format("noop").save()
    spark.catalog.clearCache()
    val plainSec = time(plain)
    val bucketedSec = time(bucketed)

    def f2(v: Double) = "%.2f".formatLocal(java.util.Locale.ROOT, v)
    val line =
      s"""{"metric":"sessionize_skew","sf":"$sfDir","total_rows":$totalRows,""" +
        s""""hot_user_rows":$hotRows,"plain_sec":${f2(plainSec)},""" +
        s""""bucketed_sec":${f2(bucketedSec)},""" +
        s""""plain_over_bucketed":${f2(plainSec / bucketedSec)},""" +
        s""""outputs_identical":true,"sessions":${cp._1},"reps":$reps}"""
    println(line)
    sys.env.get("SPARK_GRAFT_SKEW_OUT").foreach { p =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(p),
        (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    spark.stop()
  }
}
