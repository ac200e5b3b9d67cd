package graft.sink

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The reference's upsert laws (README.md:424 "Re-runs are inherently
  * safe"; database.py:222-302): idempotence, conflict accounting, and
  * the D4 metadata merge. */
class IdempotentAppendSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir() =
    Files.createTempDirectory("graft-upsert").resolve("table").toString

  private val keys = Seq("timestamp_ms", "plant")
  private val order = Seq("line")

  test("upsert: loading the same file twice ≡ once") {
    val dir = freshDir()
    val batch = Seq((1L, "A", 10.0, 1), (2L, "A", 20.0, 2), (2L, "B", 30.0, 3))
      .toDF("timestamp_ms", "plant", "generation_mwh", "line")
    val r1 = IdempotentAppend.upsert(spark, batch, dir, keys, order)
    assert(r1.inserted == 3 && r1.duplicates == 0)
    val r2 = IdempotentAppend.upsert(spark, batch, dir, keys, order)
    assert(r2.inserted == 0 && r2.duplicates == 3)
    assert(spark.read.parquet(dir).count() == 3)
  }

  test("empty batch short-circuits: zero counts, no table dir, no lock left behind") {
    val dir = freshDir()
    val empty = Seq.empty[(Long, String, Double, Int)]
      .toDF("timestamp_ms", "plant", "generation_mwh", "line")
    val r = IdempotentAppend.appendNew(spark, empty, dir, keys)
    assert(r == IdempotentAppend.UpsertResult(0L, 0L, 0L))
    // nothing published, nothing staged, no lease residue: the
    // streaming-gate empty append costs zero FS work
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir)))
    assert(!graft.warehouse.MaintenanceLock.isLocked(fs, dir))
    // and an empty batch against an EXISTING table leaves it untouched
    val batch = Seq((1L, "A", 10.0, 1)).toDF("timestamp_ms", "plant", "generation_mwh", "line")
    IdempotentAppend.upsert(spark, batch, dir, keys, order)
    val r2 = IdempotentAppend.appendNew(spark, empty, dir, keys)
    assert(r2 == IdempotentAppend.UpsertResult(0L, 0L, 0L))
    assert(spark.read.parquet(dir).count() == 1)
  }

  test("upsert: overlapping window inserts only genuinely new keys") {
    val dir = freshDir()
    val b1 = Seq((1L, "A", 10.0, 1), (2L, "A", 20.0, 2))
      .toDF("timestamp_ms", "plant", "generation_mwh", "line")
    val b2 = Seq((2L, "A", 99.0, 1), (3L, "A", 30.0, 2)) // (2,A) conflicts
      .toDF("timestamp_ms", "plant", "generation_mwh", "line")
    IdempotentAppend.upsert(spark, b1, dir, keys, order)
    val r = IdempotentAppend.upsert(spark, b2, dir, keys, order)
    assert(r.inserted == 1 && r.duplicates == 1)
    val t = spark.read.parquet(dir)
    assert(t.count() == 3)
    // first write wins: conflicting (2,A) kept generation 20.0
    assert(t.filter(col("timestamp_ms") === 2 && col("plant") === "A")
      .select("generation_mwh").as[Double].head() == 20.0)
  }

  test("upsert: in-batch duplicates resolved first-wins before append") {
    val dir = freshDir()
    val batch = Seq((1L, "A", 10.0, 1), (1L, "A", 77.0, 2))
      .toDF("timestamp_ms", "plant", "generation_mwh", "line")
    val r = IdempotentAppend.upsert(spark, batch, dir, keys, order)
    assert(r.incoming == 2 && r.inserted == 1 && r.duplicates == 1)
    assert(spark.read.parquet(dir).select("generation_mwh").as[Double].head() == 10.0)
  }

  test("order-insensitivity: final table keys identical regardless of batch order") {
    val d1 = freshDir(); val d2 = freshDir()
    val b1 = Seq((1L, "A", 1.0, 1), (2L, "A", 2.0, 2)).toDF("timestamp_ms", "plant", "generation_mwh", "line")
    val b2 = Seq((2L, "A", 9.0, 1), (3L, "A", 3.0, 2)).toDF("timestamp_ms", "plant", "generation_mwh", "line")
    IdempotentAppend.upsert(spark, b1, d1, keys, order)
    IdempotentAppend.upsert(spark, b2, d1, keys, order)
    IdempotentAppend.upsert(spark, b2, d2, keys, order)
    IdempotentAppend.upsert(spark, b1, d2, keys, order)
    val k1 = spark.read.parquet(d1).select("timestamp_ms", "plant").collect().toSet
    val k2 = spark.read.parquet(d2).select("timestamp_ms", "plant").collect().toSet
    assert(k1 == k2)
  }

  test("mergeLatest: incoming run metadata replaces same-key rows (D4)") {
    val existing = Seq(("run1", 10L, 1L), ("run2", 20L, 1L)).toDF("run_id", "total", "version")
    val incoming = Seq(("run2", 25L, 2L), ("run3", 30L, 1L)).toDF("run_id", "total", "version")
    val merged = IdempotentAppend.mergeLatest(existing, incoming,
      Seq("run_id"), Seq(col("version").desc))
    val m = merged.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m == Map("run1" -> 10L, "run2" -> 25L, "run3" -> 30L))
  }

  test("null-safe keys join NULL against empty string") {
    val inc = Seq((1L, "P", None: Option[String], 1.0)).toDF("timestamp_ms", "plant", "id", "v")
    val ex = Seq((1L, "P", Some(""), 2.0)).toDF("timestamp_ms", "plant", "id", "v")
    val nw = IdempotentAppend.newRows(inc, ex, Seq("timestamp_ms", "plant", "id"), Set("id"))
    assert(nw.count() == 0) // NULL ≡ '' under the reference's COALESCE key
  }

  test("broadcast key-prune path: identical result to the shuffled anti-join, no shuffle in the plan") {
    val dir = Files.createTempDirectory("graft-prune").toString
    // parquet round-trip so keys are data columns and plans are realistic
    spark.range(0, 20000)
      .select((col("id") % 500).as("plant_id"), col("id").as("ts"), (col("id") * 2).as("v"))
      .write.parquet(s"$dir/existing")
    spark.range(0, 300)
      .select((col("id") + 400).as("plant_id"), (col("id") + 100000).as("ts"), col("id").as("v"))
      .write.parquet(s"$dir/incoming")
    val existing = spark.read.parquet(s"$dir/existing")
    val incoming = spark.read.parquet(s"$dir/incoming")
    val keys = Seq("plant_id")

    val viaShuffle = IdempotentAppend.newRows(incoming, existing, keys)
      .select("plant_id", "ts", "v").collect().toSet
    val pruned = IdempotentAppend.newRows(incoming, existing, keys,
      incomingRowBound = Some(300L))
    val viaPrune = pruned.select("plant_id", "ts", "v").collect().toSet
    assert(viaPrune == viaShuffle,
      "broadcast key-prune changed the anti-join's result")
    // keys 500..599 exist only in incoming -> those rows survive
    assert(viaPrune.nonEmpty && viaPrune.forall(_.getLong(0) >= 500))
    // the whole pruned upsert runs on broadcasts: no exchange that
    // shuffles the existing side (shuffle-free is the point)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"),
      s"expected broadcast-only joins on the pruned path:\n$plan")
    // a bound over the threshold falls back to the shuffled form
    val fallback = IdempotentAppend.newRows(incoming, existing, keys,
      incomingRowBound = Some(IdempotentAppend.BroadcastPruneMaxKeys + 1))
    assert(fallback.select("plant_id", "ts", "v").collect().toSet == viaShuffle)
  }
}
