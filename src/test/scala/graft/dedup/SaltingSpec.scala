package graft.dedup

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SaltingSpec extends SparkSpec {
  import spark.implicits._

  // hot key: "A" carries 90% of rows
  private def skewed = ((1 to 900).map(i => ("A", i)) ++ (1 to 100).map(i => ("B", i)))
    .toDF("key", "v")

  test("saltedSum equals plain sum") {
    val salted = Salting.saltedSum(skewed, Seq(col("key")), col("v"), col("v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val plain = skewed.groupBy("key").agg(sum("v")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("saltedFirstWins equals unsalted firstWins") {
    val df = skewed.withColumn("line", col("v"))
    val salted = Salting.saltedFirstWins(df, Seq(col("key")), Seq(col("line")))
      .select("key", "v").collect().toSet
    val plain = Dedup.firstWins(df, Seq(col("key")), Seq(col("line")))
      .select("key", "v").collect().toSet
    assert(salted == plain)
    assert(salted.map(_.getString(0)) == Set("A", "B"))
  }
}
