package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming sketch-accumulator throughput sweep — the measured cost
  * of [[graft.streaming.StreamingIngest.drainSketchState]]. What the
  * round-11 sweeps established (MEASUREMENTS_R11.json): the overhead
  * decomposes as a FIXED cost per micro-batch (bounded appends,
  * amortized by trigger size exactly like admission's B ≥ λ·c rule)
  * plus a LINEAR one-sketch-pass over the batch data (inherent — the
  * same arithmetic the batch t16/t17/t20 queries pay); the STATE is
  * what stays ~zero (90 KB of batch-keyed partials against a 5.9 MB
  * sf1 corpus, parameter-bounded). The fixed part was measured at
  * ~2.4 s with three serial appends; persisting the micro-batch once
  * and submitting the four appends concurrently cut it to ~1.45 s
  * while ADDING the MG summary (on-throughput +45% at fpt 4/16).
  *
  * Method: the corpus's documents are staged as `nChunks` file
  * arrivals; TWO AvailableNow drains run the same idempotent-append
  * ingest through `foreachBatch` — one plain (append only), one that
  * additionally folds the micro-batch's CMS+KMV+HLL partials into the
  * persistent sketch state (the exact
  * [[graft.streaming.StreamingIngest.mergeSketchBatch]] path
  * drainSketchState runs). docs/s on vs off prices the accumulators;
  * the sketch-state byte size against the ingested corpus shows the
  * state is parameter-bounded, not data-bounded.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/tmp/sf1 tools/runmain.sh graft.SketchStreamBench
  * Prints ONE JSON line; the campaign merges it into STREAM_SF1.json
  * as the `sketch_accum` block.
  */
object SketchStreamBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1")
    val nChunks = sys.env.get("SPARK_GRAFT_STREAM_CHUNKS").map(_.toInt).getOrElse(32)
    // Sweep over trigger sizes: the accumulator's cost is three extra
    // bounded appends PER MICRO-BATCH (state is sketch-parameter-sized,
    // so the append work is job overhead, not data), which means the
    // overhead must amortize ~linearly with files_per_trigger — the
    // sweep turns that claim into a measured curve.
    val fpts = sys.env.getOrElse("SPARK_GRAFT_STREAM_FPT", "4,16,32")
      .split(",").map(_.trim.toInt).toSeq
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

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val nDocs = docs.count()

    def scratch(p: String) = Files.createTempDirectory(p)

    // One ingest drain: parquet-file arrivals → foreachBatch idempotent
    // append; `statePath` nonempty adds the per-batch sketch fold.
    def drain(inDir: String, tablePath: String, statePath: Option[String],
        fpt: Int): Double = {
      val ckpt = scratch("graft-skb-ckpt").toString
      val t0 = System.nanoTime()
      spark.readStream
        .schema(docs.schema)
        .option("maxFilesPerTrigger", fpt)
        .parquet(inDir)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
          graft.sink.IdempotentAppend.appendNew(
            batch.sparkSession, batch, tablePath, Seq("doc_id"), timeCol = None)
          statePath.foreach { sp =>
            graft.streaming.StreamingIngest.mergeSketchBatch(
              batch.toDF(), "text", sp, batchId,
              cmsDepth = 4, cmsWidth = 1024, kmvK = 256, hllP = 8)
          }
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
        .awaitTermination()
      (System.nanoTime() - t0) / 1e9
    }

    def dirBytes(p: String): Long = {
      val fs = org.apache.hadoop.fs.FileSystem
        .get(spark.sparkContext.hadoopConfiguration)
      val path = new org.apache.hadoop.fs.Path(p)
      if (fs.exists(path)) fs.getContentSummary(path).getLength else 0L
    }

    // Warm-up: small prefix through scratch sinks, sketches ON (covers
    // both code paths' JIT + stream-engine startup).
    val warmIn = scratch("graft-skb-warm-in").toString
    docs.limit(2000).repartition(4).write.mode("overwrite").parquet(warmIn)
    drain(warmIn, scratch("graft-skb-warm-t").resolve("t").toString,
      Some(scratch("graft-skb-warm-s").resolve("s").toString), 4)
    spark.catalog.clearCache()

    val inDir = scratch("graft-skb-in").toString
    docs.repartition(nChunks).write.mode("overwrite").parquet(inDir)

    def f1(v: Double) = "%.1f".formatLocal(java.util.Locale.ROOT, v)
    def f2(v: Double) = "%.2f".formatLocal(java.util.Locale.ROOT, v)

    var lastState: Option[String] = None
    val points = fpts.map { fpt =>
      val nBatches = math.ceil(nChunks.toDouble / fpt).toInt
      val offSec = drain(inDir, scratch("graft-skb-off").resolve("t").toString,
        None, fpt)
      spark.catalog.clearCache()
      val statePath = scratch("graft-skb-state").resolve("s").toString
      val onSec = drain(inDir, scratch("graft-skb-on").resolve("t").toString,
        Some(statePath), fpt)
      spark.catalog.clearCache()
      lastState = Some(statePath)
      val p =
        s"""{"files_per_trigger":$fpt,"micro_batches":$nBatches,""" +
          s""""off_sec":${f2(offSec)},"off_docs_per_sec":${f1(nDocs / offSec)},""" +
          s""""on_sec":${f2(onSec)},"on_docs_per_sec":${f1(nDocs / onSec)},""" +
          s""""overhead_pct":${f1((onSec / offSec - 1.0) * 100.0)},""" +
          s""""overhead_sec_per_batch":${f2((onSec - offSec) / nBatches)}}"""
      System.err.println(s"[sketchbench] $p")
      p
    }

    val statePath = lastState.get
    val stateBytes = dirBytes(statePath)
    // One wide row per batch since round 12: per-family "rows" =
    // total array elements across the batch rows (the same partial
    // rows the per-family tables used to hold).
    val fams = Seq("cms", "kmv", "hll", "mg", "qs", "bloom")
    val stateRows = {
      val counts: Map[String, Long] =
        if (new java.io.File(s"$statePath/wide").isDirectory) {
          val r = spark.read.parquet(s"$statePath/wide")
            .select(fams.map(s =>
              coalesce(sum(size(col(s))), lit(0L)).cast("long").as(s)): _*)
            .head()
          fams.zipWithIndex.map { case (s, i) => s -> r.getLong(i) }.toMap
        } else fams.map(_ -> 0L).toMap
      fams.map(s => s""""$s":${counts(s)}""").mkString("{", ",", "}")
    }

    val line =
      s"""{"metric":"sketch_accum","sf":"$sfDir","docs":$nDocs,"chunks":$nChunks,""" +
        s""""sweep":${points.mkString("[", ",", "]")},""" +
        s""""state_bytes":$stateBytes,""" +
        s""""state_rows":$stateRows}"""
    println(line)
    sys.env.get("SPARK_GRAFT_SKETCH_OUT").foreach { p =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(p),
        (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    spark.stop()
  }
}
