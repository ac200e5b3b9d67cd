package graft.dedup

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}
import graft.SparkSpec
import graft.sink.IdempotentAppend

/** Property tests for the laws the reference guarantees (SURVEY.md §5):
  * upsert idempotence (README.md:424), order-insensitivity of the
  * final key set, and report-count conservation
  * (validator.py:487-524). Uses ScalaCheck generators with fixed seeds
  * (deterministic — each Spark round-trip is expensive, so a small
  * fixed trial count beats the default 100). */
class DedupLawsSpec extends SparkSpec {
  import spark.implicits._

  private val recordGen: Gen[(Long, String, Double)] = for {
    ts <- Gen.choose(1L, 5L)
    plant <- Gen.oneOf("A", "B")
    v <- Gen.choose(0, 1000)
  } yield (ts, plant, v.toDouble)

  private val batchGen = Gen.listOfN(12, recordGen)

  private def sample(seed: Long): List[(Long, String, Double)] =
    batchGen(Gen.Parameters.default, rng.Seed(seed))
      .getOrElse(fail(s"generator failed for seed $seed"))

  private def mk(r: List[(Long, String, Double)]) = r.zipWithIndex
    .map { case ((ts, p, v), i) => (ts, p, v, i.toLong) }
    .toDF("timestamp_ms", "plant", "v", "line")

  private val keys = Seq("timestamp_ms", "plant")

  test("law: firstWins twice ≡ once, and |out| = countDistinct(keys)") {
    for (seed <- 1L to 6L) {
      val df = mk(sample(seed))
      val once = Dedup.firstWinsByName(df, keys, Seq("line"))
      val twice = Dedup.firstWinsByName(once, keys, Seq("line"))
      assert(once.collect().toSet == twice.collect().toSet, s"seed=$seed")
      assert(once.count() == df.select("timestamp_ms", "plant").distinct().count(), s"seed=$seed")
      assert(Dedup.duplicateCount(once, keys.map(col)).head().getLong(0) == 0, s"seed=$seed")
    }
  }

  test("law: upsert batches in any order yield the same final key set; counts conserve") {
    for (seed <- 10L to 13L) {
      val (b1, b2) = (sample(seed), sample(seed + 100))
      val d1 = Files.createTempDirectory("law").resolve("t").toString
      val d2 = Files.createTempDirectory("law").resolve("t").toString
      val r11 = IdempotentAppend.upsert(spark, mk(b1), d1, keys, Seq("line"))
      val r12 = IdempotentAppend.upsert(spark, mk(b2), d1, keys, Seq("line"))
      IdempotentAppend.upsert(spark, mk(b2), d2, keys, Seq("line"))
      IdempotentAppend.upsert(spark, mk(b1), d2, keys, Seq("line"))

      val k1 = spark.read.parquet(d1).select("timestamp_ms", "plant").collect().toSet
      val k2 = spark.read.parquet(d2).select("timestamp_ms", "plant").collect().toSet
      assert(k1 == k2, s"seed=$seed")
      // conservation: inserted + duplicates = incoming, per batch
      assert(r11.inserted + r11.duplicates == r11.incoming, s"seed=$seed")
      assert(r12.inserted + r12.duplicates == r12.incoming, s"seed=$seed")
      // final table size = distinct keys across both batches
      assert(k1.size == mk(b1).unionByName(mk(b2))
        .select("timestamp_ms", "plant").distinct().count(), s"seed=$seed")
    }
  }
}
