package graft.ingest

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.schema.Schemas

class JsonlSourceSpec extends SparkSpec {

  test("schema-enforced JSONL read: valid rows parsed, malformed captured, blanks skipped") {
    val dir = Files.createTempDirectory("graft-jsonl")
    val f = dir.resolve("in.jsonl")
    Files.writeString(f,
      """{"extraction_run_id":"550e8400-e29b-41d4-a716-446655440000","created_at_ms":1700000000000,"timestamp_ms":1690000000000,"resolution_minutes":1440,"plant":"Kudankulam","plant_and_unit":"Kudankulam Unit 1","unit":"Unit 1","generation_mwh":1000.5}
        |
        |this is not json
        |{"timestamp_ms":1690000000001,"plant":"X","plant_and_unit":"X 1","generation_mwh":1.0}
        |""".stripMargin)
    val df = JsonlSource.readJsonl(spark, f.toString, Schemas.npp)
    val (good, bad) = JsonlSource.splitCorrupt(df)
    assert(good.count() == 2)
    assert(bad.count() == 1)
    assert(good.filter(col("plant") === "Kudankulam").select("generation_mwh")
      .head().getDouble(0) == 1000.5)
    // absent envelope fields read as null under schema-on-read
    assert(good.filter(col("plant") === "X").select("extraction_run_id").head().isNullAt(0))
  }

  test("parseJsonLines round-trips a struct through JSONL text") {
    import spark.implicits._
    val src = Seq((1L, "A", 2.5), (2L, "B", 3.5)).toDF("id", "name", "v")
    val lines = src.select(to_json(struct(col("id"), col("name"), col("v"))).as("line"))
    val parsed = JsonlSource.parseJsonLines(lines, "line", src.schema)
    assert(parsed.collect().toSet == src.collect().toSet)
  }

  test("readJsonlOrdered line order is monotonic in file order") {
    val dir = Files.createTempDirectory("graft-jsonl2")
    val f = dir.resolve("in.jsonl")
    Files.writeString(f, (1 to 50)
      .map(i => s"""{"timestamp_ms":$i,"plant":"P$i","plant_and_unit":"U","generation_mwh":1.0}""")
      .mkString("\n"))
    val df = JsonlSource.readJsonlOrdered(spark, f.toString, Schemas.npp)
    val rows = df.orderBy(JsonlSource.LineOrderCol)
      .select("timestamp_ms").collect().map(_.getLong(0)).toSeq
    assert(rows == (1L to 50L))
  }
}
