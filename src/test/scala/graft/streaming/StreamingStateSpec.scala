package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec
import graft.schema.Schemas

/** Watermarked windowed aggregation + custom state
  * (flatMapGroupsWithState) over the streaming ingest surface.
  *
  * Sink notes (the part that trips people up): an append-mode file
  * sink only emits a window once the watermark passes its end, which
  * in AvailableNow runs means "next run with later data" — so the
  * windowed test reads the in-memory complete-mode result, and the
  * update-mode state test lands each micro-batch via foreachBatch.
  */
class StreamingStateSpec extends SparkSpec {

  private val runId = "550e8400-e29b-41d4-a716-446655440000"
  private val day1 = 1706745600000L // 2024-02-01
  private val day2 = 1706832000000L // 2024-02-02

  private def writeInput(): String = {
    val in = Files.createTempDirectory("graft-sstate")
    Files.writeString(in.resolve("a.jsonl"),
      s"""{"timestamp_ms":$day1,"plant":"P1","plant_and_unit":"P1 U1","generation_mwh":10.0}
         |{"timestamp_ms":${day1 + 3600000},"plant":"P1","plant_and_unit":"P1 U1","generation_mwh":5.0}
         |{"timestamp_ms":$day2,"plant":"P2","plant_and_unit":"P2 U1","generation_mwh":7.0}
         |""".stripMargin)
    in.toString
  }

  private def piped(in: String): DataFrame =
    StreamingIngest.pipeline(
      StreamingIngest.readStream(spark, in, Schemas.npp),
      runId, 1000L, Schemas.naturalKeys("npp"))

  test("windowed rollup with watermark aggregates per day window") {
    val rolled = StreamingIngest.windowedRollup(piped(writeInput()), "timestamp_ms",
      Seq("plant"), "generation_mwh")
    rolled.writeStream
      .format("memory").queryName("rolled_test")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow()).start().awaitTermination()
    val m = spark.table("rolled_test").collect().map(r =>
      (r.getAs[java.sql.Timestamp]("window_start").toString.take(10), r.getAs[String]("plant"))
        -> r.getAs[Double]("total_generation_mwh")).toMap
    assert(m(("2024-02-01", "P1")) == 15.0)
    assert(m(("2024-02-02", "P2")) == 7.0)
  }

  test("flatMapGroupsWithState keeps running totals per entity across runs") {
    val in = writeInput()
    val ckpt = Files.createTempDirectory("graft-state-ck").toString
    val outDir = Files.createTempDirectory("graft-state-out").toString + "/t"

    def drain(): Unit =
      StreamingIngest.runningTotals(spark, piped(in), "plant", "generation_mwh")
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[StreamingIngest.EntityState], _: Long) =>
          batch.write.mode("append").parquet(outDir)
        }
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(Trigger.AvailableNow()).start().awaitTermination()

    drain()
    val m1 = spark.read.parquet(outDir).collect()
      .map(r => r.getAs[String]("entity") -> ((r.getAs[Double]("totalMwh"), r.getAs[Long]("records"))))
      .toMap
    assert(m1("P1") == ((15.0, 2L)))
    assert(m1("P2") == ((7.0, 1L)))

    // new file, second drain: state carries over the checkpoint
    Files.writeString(java.nio.file.Paths.get(in).resolve("b.jsonl"),
      s"""{"timestamp_ms":${day2 + 7200000},"plant":"P1","plant_and_unit":"P1 U9","generation_mwh":100.0}
         |""".stripMargin)
    drain()
    val rows = spark.read.parquet(outDir).collect()
      .map(r => (r.getAs[String]("entity"), r.getAs[Double]("totalMwh"), r.getAs[Long]("records")))
    assert(rows.contains(("P1", 115.0, 3L)))
  }
}
