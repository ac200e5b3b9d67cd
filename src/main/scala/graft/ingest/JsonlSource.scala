package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** Schema-enforced JSONL scan (reference operators S1–S4).
  *
  * The reference reads JSONL line-by-line into Python dicts with manual
  * 500k-record batches / 50k-line chunks to bound memory (reference
  * src/database.py:469-470, :568, :1059). On Spark the file is split
  * across input partitions and executors stream it, so batching is
  * obsolete; the schema is *enforced*, never inferred, mirroring the
  * reference's fixed-schema design (src/validator.py:123-276).
  *
  * Scale notes: a JSONL scan at 100 TB parallelizes by HDFS-style file
  * splits (newline-delimited JSON is splittable); keep files ≥128 MB or
  * many files, and never `collect()` — every downstream op stays a
  * narrow map until the first key-based shuffle.
  */
object JsonlSource {

  val CorruptCol = "_corrupt_record"

  /** Line-order column captured at read time, *before* any shuffle, so
    * that first-occurrence-wins dedup (reference validator.py:507-519)
    * has a stable total order. Valid because ids are monotonically
    * increasing within each input partition and partitions are ordered
    * by file-split offset. */
  val LineOrderCol = "_line_order"

  /** S1/S2/S3: read JSONL with an enforced schema. Malformed lines are
    * captured in [[CorruptCol]] (PERMISSIVE mode) instead of killing
    * the job — the analog of the reference's per-line warnings
    * (database.py:633-665). Blank lines are dropped by the JSON reader
    * just like the reference's `if line.strip()` filter
    * (database.py:469-470). */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add(CorruptCol, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  /** Same scan with a stable line-order column for first-wins dedup. */
  def readJsonlOrdered(spark: SparkSession, path: String, schema: StructType): DataFrame =
    readJsonl(spark, path, schema)
      .withColumn(LineOrderCol, monotonically_increasing_id())

  /** Raw-line VARIANT column carried through the pipeline for P10
    * lexical type rules. */
  val VariantCol = "_raw_variant"

  /** Ingest-path scan: typed fields (same Jackson parse semantics as
    * [[readJsonl]]) PLUS the raw line as a VARIANT, so P10 lexical
    * type rules can see the original JSON token types that
    * schema-on-read erases. Corrupt = the line is not valid JSON
    * (`try_parse_json` null) — a *well-formed* line with a wrong-typed
    * field is NOT corrupt; its field reads null and the P10/required
    * rules classify it invalid, exactly the reference's split
    * (validator.py:390-426 vs database.py:633-665).
    *
    * Cost note: the line is parsed twice (Jackson + variant). Both are
    * narrow codegen'd per-row work on a splittable text scan — at
    * 100 TB this stays embarrassingly parallel; no shuffle is added. */
  def readJsonlWithVariant(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val parsed = spark.read
      .text(path)
      .filter(length(trim(col("value"))) > 0) // reference's `if line.strip()`
      .withColumn(LineOrderCol, monotonically_increasing_id())
      .withColumn(VariantCol, try_parse_json(col("value")))
      .withColumn("_parsed", from_json(col("value"), schema, Map("mode" -> "PERMISSIVE")))
    parsed.select(
      schema.fieldNames.toIndexedSeq.map(f => col(s"_parsed.$f").as(f)) ++ Seq(
        when(col(VariantCol).isNull, col("value")).as(CorruptCol),
        col(VariantCol),
        col(LineOrderCol),
      ): _*)
  }

  /** Parse an in-memory column of JSONL lines against an enforced
    * schema — same semantics as [[readJsonl]] but usable on any string
    * column (e.g. a Kafka value or a test fixture). */
  def parseJsonLines(df: DataFrame, lineCol: String, schema: StructType): DataFrame = {
    val parsed = df.withColumn("_parsed", from_json(col(lineCol), schema))
    schema.fieldNames.foldLeft(parsed) { (acc, f) =>
      acc.withColumn(f, col(s"_parsed.$f"))
    }.drop("_parsed", lineCol)
  }

  /** Split a permissive scan into (good, corrupt) record frames.
    * The input is cached first: Spark disallows queries that touch
    * only the internal corrupt-record column of a raw JSON scan
    * (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), and both
    * branches re-read the scan anyway. */
  def splitCorrupt(df: DataFrame): (DataFrame, DataFrame) = {
    // The cache is load-bearing, not advisory: Spark disallows querying
    // ONLY the internal corrupt-record column from raw JSON
    // (QUERY_ONLY_CORRUPT_RECORD_COLUMN), so the `bad` branch is legal
    // exactly while the parse is cached. Inside a CacheScope.shared
    // block (IngestJob.load) the scope keeps it cached across all the
    // load's actions and releases at block end even on exception;
    // standalone callers own a plain cache (unpersist when done).
    val cached =
      if (graft.quality.CacheScope.inShared)
        graft.quality.CacheScope.cachedUntilAction(df)
      else df.cache()
    val good = cached.filter(col(CorruptCol).isNull).drop(CorruptCol)
    val bad = cached.filter(col(CorruptCol).isNotNull)
    (good, bad)
  }
}
