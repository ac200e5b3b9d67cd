package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import graft.text.TextDedup

/** Shuffle-bytes probe for the td14/td15 exact-substring dedup pair —
  * the measurement ARCHITECTURE.md's packed-key claim rests on: the
  * 128-bit hash-packed gram key exists ONLY to cut the dominant
  * shuffle's bytes (TextDedup.exactSubstringDedupPacked scaladoc), so
  * the saving must be a number, not an assertion.
  *
  * Method: run each variant over the target corpus with a
  * task-metrics listener summing shuffle WRITE and READ bytes across
  * every task of the job (reset between runs; poll for the async
  * task-end events to settle before reading, as UpsertSkewSpec does).
  * Bytes are deterministic per (variant, corpus) — the first timed
  * rep's byte counts are THE byte counts; wall time is min across
  * reps after a JIT warm-up pass at sf0.001.
  *
  * Usage: tools/runmain.sh graft.ShuffleProbe <sfDir> [reps]
  * (SPARK_DRIVER_MEM=48g for sf10). Prints one JSON line; the
  * campaign writes it to SHUFFLE_TD14_<sf>.json.
  */
object ShuffleProbe {
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

    val writeBytes = new AtomicLong
    val readBytes = new AtomicLong
    val nTasks = new AtomicLong
    val listener = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          writeBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          readBytes.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          nTasks.incrementAndGet()
          ()
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    // task-end events are async: wait until the counter stops moving
    def settle(): Unit = {
      val deadline = System.currentTimeMillis() + 15000
      var last = -1L
      while (nTasks.get() != last && System.currentTimeMillis() < deadline) {
        last = nTasks.get()
        Thread.sleep(300)
      }
    }

    val variants: Seq[(String, String => org.apache.spark.sql.DataFrame)] = Seq(
      "td14_exact" -> (dir =>
        TextDedup.exactSubstringDedup(
          spark.read.parquet(s"$dir/documents.parquet"), "doc_id", "text", k = 8)),
      "td15_packed" -> (dir =>
        TextDedup.exactSubstringDedupPacked(
          spark.read.parquet(s"$dir/documents.parquet"), "doc_id", "text", k = 8)))

    // JIT warm-up at the smallest corpus (compilation cost is session
    // cost, not the variants' cost)
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory)
      variants.foreach { case (_, f) =>
        f(warmDir).write.mode("overwrite").format("noop").save()
      }
    spark.catalog.clearCache()

    def f2(v: Double) = "%.2f".formatLocal(java.util.Locale.ROOT, v)

    val measured = variants.map { case (name, f) =>
      var bestWall = Double.MaxValue
      var wb = 0L
      var rb = 0L
      var tk = 0L
      for (rep <- 0 until reps) {
        settle()
        writeBytes.set(0); readBytes.set(0); nTasks.set(0)
        val t0 = System.nanoTime()
        f(sfDir).write.mode("overwrite").format("noop").save()
        val wall = (System.nanoTime() - t0) / 1e9
        settle()
        if (rep == 0) { wb = writeBytes.get(); rb = readBytes.get(); tk = nTasks.get() }
        bestWall = math.min(bestWall, wall)
        System.err.println(
          f"[shuffleprobe] $name rep$rep wall=$wall%.2fs " +
            f"write=${writeBytes.get() / 1e6}%.1fMB read=${readBytes.get() / 1e6}%.1fMB")
        spark.catalog.clearCache()
      }
      (name, bestWall, wb, rb, tk)
    }

    val byName = measured.map(m => m._1 -> m).toMap
    val ratio = byName("td14_exact")._3.toDouble /
      math.max(1L, byName("td15_packed")._3).toDouble
    val vjson = measured.map { case (n, wall, wb, rb, tk) =>
      s""""$n":{"wall_sec":${f2(wall)},"shuffle_write_bytes":$wb,""" +
        s""""shuffle_read_bytes":$rb,"tasks":$tk}"""
    }.mkString(",")
    val line =
      s"""{"metric":"td14_shuffle_bytes","sf":"$sfDir","reps":$reps,""" +
        s"""$vjson,"write_bytes_exact_over_packed":${f2(ratio)}}"""
    println(line)
    val out = sys.env.get("SPARK_GRAFT_SHUFFLE_OUT")
    out.foreach { p =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(p),
        (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    spark.stop()
  }
}
