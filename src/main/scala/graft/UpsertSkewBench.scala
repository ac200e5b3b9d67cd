package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Large-batch upsert skew point — the measured end of the 100 TB
  * upsert story: batches over `BroadcastPruneMaxKeys` fall to the
  * shuffled anti-join with AQE skew handling (IdempotentAppend
  * scaladoc; UpsertSkewSpec proves the delegation engages on a
  * scaled-down fixture with LOWERED thresholds). This main measures
  * the real thing at real sizes with DEFAULT AQE settings: a 5M-row
  * batch — 30% of it one hot plant — appended against a 10M-row
  * existing table, payloads high-entropy enough (768 hex chars of
  * salted SHA-256) that the hot key's shuffle partition crosses
  * the default 256 MB skew bar the way a 100 TB ingest's would.
  *
  * Two runs:
  *   - evidence: `IdempotentAppend.newRows` executed directly, final
  *     AQE plan checked for the `skew=true` marker, task shuffle-read
  *     distribution collected (max/median = the no-straggler proof);
  *   - end-to-end: `IdempotentAppend.appendNew` against the staged
  *     table (lease + anti-join + atomic publish), wall-clock timed.
  *
  * Usage: SPARK_DRIVER_MEM=32g tools/runmain.sh graft.UpsertSkewBench
  */
object UpsertSkewBench {
  def main(args: Array[String]): Unit = {
    val nExisting = args.headOption.map(_.toLong).getOrElse(10000000L)
    val nBatch = args.lift(1).map(_.toLong).getOrElse(5000000L)
    val hotRows = nBatch * 3 / 10
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

    val base = java.nio.file.Files.createTempDirectory("graft-upsertskew").toString

    // 768 hex chars (384 B of entropy) of payload per row: 12 salted
    // SHA-256 digests. Entropy is what matters: AQE's skew bars act
    // on COMPRESSED shuffle bytes, and a constant pad would vanish
    // under lz4 — the hot plant must weigh what 1.5M real rows weigh.
    def payload(plant: org.apache.spark.sql.Column, ts: org.apache.spark.sql.Column) =
      concat((0 until 12).map(i =>
        sha2(concat_ws("|", plant, ts, lit(i)), 256)): _*).as("payload")

    // Existing table: 2000 plants, unique ts, nExisting rows.
    val existingDir = s"$base/existing"
    spark.range(0, nExisting)
      .select(
        (col("id") % 2000 + 1000).as("plant_id"),
        col("id").as("ts"))
      .select(col("plant_id"), col("ts"), payload(col("plant_id"), col("ts")))
      .write.mode("overwrite").parquet(existingDir)

    // Batch: hot plant 42 owns 30% of rows; the rest spread over 3000
    // NEW plants — every key is new, so the append keeps all 5M rows.
    val batchDir = s"$base/batch"
    spark.range(0, nBatch)
      .select(
        when(col("id") < hotRows, lit(42L))
          .otherwise(col("id") % 3000 + 5000).as("plant_id"),
        col("id").as("ts"))
      .select(col("plant_id"), col("ts"), payload(col("plant_id"), col("ts")))
      .write.mode("overwrite").parquet(batchDir)

    val existing = spark.read.parquet(existingDir)
    val batch = spark.read.parquet(batchDir)

    // ---- Evidence run: AQE skew marker + task-read distribution ----
    val taskReads = scala.collection.concurrent.TrieMap.empty[Long, Long]
    val listener = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null && m.shuffleReadMetrics.totalBytesRead > 0)
          taskReads.put(te.taskInfo.taskId, m.shuffleReadMetrics.totalBytesRead)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val out = graft.sink.IdempotentAppend.newRows(
      batch, existing, Seq("plant_id"), incomingRowBound = Some(nBatch))
    val t0 = System.nanoTime()
    out.write.mode("overwrite").format("noop").save()
    val joinSec = (System.nanoTime() - t0) / 1e9
    val finalPlan = out.queryExecution.executedPlan.toString
    val skewMarked = finalPlan.contains("skew=true")
    // task-end events are async
    val deadline = System.currentTimeMillis() + 15000
    var last = -1
    while (taskReads.size != last && System.currentTimeMillis() < deadline) {
      last = taskReads.size
      Thread.sleep(300)
    }
    spark.sparkContext.removeSparkListener(listener)
    val reads = taskReads.values.toSeq.sorted
    val medianRead = if (reads.nonEmpty) reads(reads.size / 2) else 0L
    val maxRead = if (reads.nonEmpty) reads.max else 0L

    // ---- End-to-end timed run: the real append path ----
    val tableDir = s"$base/table"
    // stage the existing table as the append target (bytewise copy of
    // the parquet dir via a read→write round trip)
    existing.write.mode("overwrite").parquet(tableDir)
    spark.catalog.clearCache()
    val t1 = System.nanoTime()
    val res = graft.sink.IdempotentAppend.appendNew(
      spark, batch, tableDir, Seq("plant_id"), timeCol = None)
    val appendSec = (System.nanoTime() - t1) / 1e9

    def f2(v: Double) = "%.2f".formatLocal(java.util.Locale.ROOT, v)
    val line =
      s"""{"metric":"upsert_skew","existing_rows":$nExisting,"batch_rows":$nBatch,""" +
        s""""hot_plant_rows":$hotRows,"join_sec":${f2(joinSec)},""" +
        s""""append_sec":${f2(appendSec)},"inserted":${res.inserted},""" +
        s""""skew_marked":$skewMarked,"join_tasks":${reads.size},""" +
        s""""max_task_read_mb":${f2(maxRead / 1e6)},""" +
        s""""median_task_read_mb":${f2(medianRead / 1e6)},""" +
        s""""max_over_median":${f2(if (medianRead > 0) maxRead.toDouble / medianRead else 0.0)}}"""
    println(line)
    sys.env.get("SPARK_GRAFT_UPSERT_OUT").foreach { p =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(p),
        (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    spark.stop()
  }
}
