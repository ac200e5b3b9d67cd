package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType
import graft.ingest.{Enrich, JsonlSource}

/** Structured-Streaming ingest surface (SURVEY.md §2.10).
  *
  * The reference has no true streaming — its "streaming ingestion"
  * (reference README.md:134) is chunked incremental JSONL reads
  * (S2/S3) with idempotent upsert as the late-data story. The natural
  * Spark analog is a file-source stream with `Trigger.AvailableNow`:
  * each run drains whatever files have arrived and stops — exactly
  * the reference's monthly incremental batch, but with checkpointed
  * progress instead of a high-watermark query.
  *
  * Dedup: `dropDuplicates(naturalKey)` — in AvailableNow mode the
  * state store covers the whole drain, giving in-run exactly-once on
  * the key; cross-run duplicates are neutralized by the sink's
  * idempotent-append (same argument as the reference's ON CONFLICT).
  * A `withWatermark` variant bounds state for continuous mode.
  */
object StreamingIngest {

  /** Open a schema-enforced JSONL file stream over a directory. */
  def readStream(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.readStream
      .schema(schema.add(JsonlSource.CorruptCol, org.apache.spark.sql.types.StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", JsonlSource.CorruptCol)
      .json(dir)

  /** Ingest pipeline on a stream: corrupt-filter → enrich → key dedup. */
  def pipeline(
      stream: DataFrame,
      runId: String,
      nowMs: Long,
      naturalKey: Seq[String],
      watermark: Option[(String, String)] = None,
  ): DataFrame = {
    val good = stream
      .filter(org.apache.spark.sql.functions.col(JsonlSource.CorruptCol).isNull)
      .drop(JsonlSource.CorruptCol)
    val enriched = Enrich.ensureRunMetadata(good, runId, nowMs)
    val marked = watermark match {
      case Some((tsCol, delay)) => enriched.withWatermark(tsCol, delay)
      case None => enriched
    }
    marked.dropDuplicates(naturalKey)
  }

  /** Drain all available input into a parquet table and stop —
    * the incremental-batch run (Trigger.AvailableNow). */
  def drainToParquet(
      df: DataFrame,
      tablePath: String,
      checkpointPath: String,
  ): StreamingQuery =
    df.writeStream
      .format("parquet")
      .option("path", tablePath)
      .option("checkpointLocation", checkpointPath)
      .trigger(Trigger.AvailableNow())
      .start()
}
