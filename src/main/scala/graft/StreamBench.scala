package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Streaming near-dup admission throughput — the measured point for
  * [[graft.streaming.StreamingIngest.drainNearDupGate]] that the batch
  * dedup family already has (ARCHITECTURE.md scale appendix).
  *
  * Method: the corpus's documents are staged as `nChunks` parquet
  * files in an incoming dir (each file = one arrival unit), then ONE
  * AvailableNow drain runs the full admission path — per-micro-batch
  * verified MinHash dedup, (band,bucket) gate against the persistent
  * index, two idempotent appends — with `maxFilesPerTrigger` forcing
  * `nChunks / filesPerTrigger` sequential micro-batches, exactly the
  * cross-batch state regime a long-running ingest sees (every batch
  * gates against all previously admitted buckets). The batch twin
  * (one-shot `minhashDedup` over the same corpus + one append) is
  * timed on the same session for the docs/s comparison.
  *
  * A small warm-up drain (first `warmupDocs` docs through scratch
  * sinks) soaks JIT + streaming-engine startup so the measured drain
  * prices the admission path, not first-query compilation.
  *
  * Prints ONE JSON line; the round artifact commits as
  * STREAM_SF1.json. Usage:
  *   SPARK_GRAFT_SF_DIR=/tmp/sf1 sbt "runMain graft.StreamBench"
  */
object StreamBench {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nChunks = sys.env.get("SPARK_GRAFT_STREAM_CHUNKS").map(_.toInt).getOrElse(32)
    val filesPerTrigger = sys.env.get("SPARK_GRAFT_STREAM_FPT").map(_.toInt).getOrElse(4)
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

    def drain(inDir: String, adm: String, idx: String): Unit = {
      val ckpt = scratch("graft-sb-ckpt").toString
      val stream = spark.readStream
        .schema(docs.schema)
        .option("maxFilesPerTrigger", filesPerTrigger)
        .parquet(inDir)
      graft.streaming.StreamingIngest.drainNearDupGate(
        stream, adm, idx, ckpt, "doc_id", "text").awaitTermination()
    }

    // Warm-up: a small prefix through scratch sinks (JIT + stream
    // engine startup are session cost, not admission cost).
    val warmIn = scratch("graft-sb-warm-in").toString
    docs.limit(2000).repartition(4).write.mode("overwrite").parquet(warmIn)
    drain(warmIn, scratch("graft-sb-warm-adm").resolve("t").toString,
      scratch("graft-sb-warm-idx").resolve("i").toString)
    spark.catalog.clearCache()

    // Staged arrivals: nChunks files, hash-spread (arrival order is
    // not corpus order, as in a real ingest).
    val inDir = scratch("graft-sb-in").toString
    docs.repartition(nChunks).write.mode("overwrite").parquet(inDir)

    val adm = scratch("graft-sb-adm").resolve("t").toString
    val idx = scratch("graft-sb-idx").resolve("i").toString
    val t0 = System.nanoTime()
    drain(inDir, adm, idx)
    val streamSec = (System.nanoTime() - t0) / 1e9
    val admitted = spark.read.parquet(adm).count()

    // Batch twin on the warmed session: one-shot verified dedup + one
    // idempotent append of the survivors.
    val batchOut = scratch("graft-sb-batch").resolve("t").toString
    val t1 = System.nanoTime()
    val deduped = graft.text.TextDedup.minhashDedup(docs, "doc_id", "text", 0.9, 3, 30, 6)
    graft.sink.IdempotentAppend.appendNew(
      spark, deduped, batchOut, Seq("doc_id"), timeCol = None)
    val batchSec = (System.nanoTime() - t1) / 1e9
    val batchKept = spark.read.parquet(batchOut).count()

    def f1(v: Double) = "%.1f".formatLocal(java.util.Locale.ROOT, v)
    def f2(v: Double) = "%.2f".formatLocal(java.util.Locale.ROOT, v)
    val line =
      s"""{"metric":"stream_admission_docs_per_sec","value":${f1(nDocs / streamSec)},""" +
        s""""unit":"docs/sec","docs":$nDocs,"chunks":$nChunks,"files_per_trigger":$filesPerTrigger,""" +
        s""""micro_batches":${math.ceil(nChunks.toDouble / filesPerTrigger).toInt},""" +
        s""""stream_sec":${f2(streamSec)},"admitted":$admitted,""" +
        s""""batch_sec":${f2(batchSec)},"batch_docs_per_sec":${f1(nDocs / batchSec)},""" +
        s""""batch_kept":$batchKept,"cpus":$cpus,"sf":"$sfDir"}"""
    val outPath = sys.env.getOrElse("SPARK_GRAFT_STREAM_OUT", "STREAM_BENCH.json")
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(outPath),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case scala.util.control.NonFatal(_) => () }
    println(line)
    spark.stop()
  }
}
