package graft.dedup

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val dupped = Seq(
    (1L, "A", "x", 1), // key (1,A) first occurrence
    (1L, "A", "y", 2), // duplicate, must lose
    (1L, "B", "z", 3),
    (2L, "A", "w", 4),
  ).toDF("ts", "plant", "payload", "line")

  test("firstWins keeps first occurrence per natural key") {
    val out = Dedup.firstWinsByName(dupped, Seq("ts", "plant"), Seq("line"))
    val kept = out.select("payload").as[String].collect().toSet
    assert(kept == Set("x", "z", "w"))
  }

  test("firstWins is idempotent") {
    val once = Dedup.firstWinsByName(dupped, Seq("ts", "plant"), Seq("line"))
    val twice = Dedup.firstWinsByName(once, Seq("ts", "plant"), Seq("line"))
    assert(once.collect().toSet == twice.collect().toSet)
  }

  test("null-safe key: NULL id collides with empty string (reference COALESCE key)") {
    val df = Seq(
      (1L, "P", Some("7"), 1),
      (1L, "P", None, 2),
      (1L, "P", Some(""), 3), // same key as line 2 under COALESCE(id,'')
    ).toDF("ts", "plant", "id", "line")
    val out = Dedup.firstWins(df,
      Seq(col("ts"), col("plant"), Dedup.nullSafe(col("id"))), Seq(col("line")))
    assert(out.count() == 2)
    assert(out.filter(col("line") === 3).count() == 0) // line 3 lost to line 2
  }

  test("duplicateCount matches count - countDistinct") {
    val n = Dedup.duplicateCount(dupped, Seq(col("ts"), col("plant"))).head().getLong(0)
    assert(n == 1)
    val clean = Dedup.firstWinsByName(dupped, Seq("ts", "plant"), Seq("line"))
    assert(Dedup.duplicateCount(clean, Seq(col("ts"), col("plant"))).head().getLong(0) == 0)
  }

  test("duplicateGroups lists keys with multiplicity > 1") {
    val g = Dedup.duplicateGroups(dupped, Seq(col("ts"), col("plant"))).collect()
    assert(g.length == 1 && g(0).getLong(2) == 2)
  }

  test("first-wins on real lineitem dups agrees with dropDuplicates cardinality") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val keys = Seq("l_orderkey", "l_linenumber")
    val fw = Dedup.firstWinsByName(li, keys,
      Seq("l_shipdate", "l_partkey", "l_suppkey", "l_extendedprice"))
    assert(fw.count() == li.dropDuplicates(keys).count())
  }
}
