package graft.multimodal

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("asMediaTable: opaque binary payload + typed metadata") {
    val docs = Seq((1L, "héllo"), (2L, "")).toDF("doc_id", "text")
    val media = Multimodal.asMediaTable(docs, "doc_id", "text")
    val r = media.orderBy("media_id").collect()
    assert(r(0).getLong(3) == 6) // é is 2 UTF-8 bytes
    assert(r(1).getLong(3) == 0)
    assert(media.schema("payload").dataType.typeName == "binary")
  }

  test("extractFeatures: deterministic stubbed decode over partition batches") {
    val docs = Seq((1L, "abc"), (2L, "abc"), (3L, "xyz")).toDF("doc_id", "text")
    val media = Multimodal.asMediaTable(docs, "doc_id", "text")
    val f = Multimodal.extractFeaturesDf(spark, media).collect()
      .map(r => r.getAs[Long]("media_id") -> r.getAs[Long]("checksum")).toMap
    assert(f(1L) == f(2L)) // same payload → same features
    assert(f(1L) == ('a'.toInt + 'b'.toInt + 'c'.toInt))
    assert(f(3L) != f(1L))
  }

  test("resize stub: payload resampled to thumbnail-scaled size, metadata updated") {
    val docs = Seq((1L, "x" * 500)).toDF("doc_id", "text")
    val media = Multimodal.asMediaTable(docs, "doc_id", "text")
    val resized = Multimodal.resize(spark, media, 32, 32)
    val r = resized.head()
    assert(r.getAs[Long]("n_bytes") == 16) // 32*32/64
    assert(r.getAs[Array[Byte]]("payload").length == 16)
    // deterministic
    assert(Multimodal.resize(spark, media, 32, 32).head()
      .getAs[Array[Byte]]("payload").toSeq == r.getAs[Array[Byte]]("payload").toSeq)
  }

  test("frame sampling: every Nth fixed-size chunk, one row per kept frame") {
    val docs = Seq((1L, "a" * 100)).toDF("doc_id", "text")
    val media = Multimodal.asMediaTable(docs, "doc_id", "text")
    val frames = Multimodal.sampleFrames(spark, media, frameBytes = 32, every = 2)
    // 100 bytes → chunks 0..3 (32,32,32,4); kept: 0 and 2
    assert(frames.count() == 2)
    assert(frames.select("frame_no").collect().map(_.getInt(0)).toSet == Set(0, 2))
  }

  test("metadata-only query prunes the payload column from the scan") {
    val docs = Seq((1L, "abc")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-media").toString + "/t"
    Multimodal.asMediaTable(docs, "doc_id", "text").write.parquet(dir)
    val plan = spark.read.parquet(dir).select("media_id", "n_bytes")
      .queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<media_id:bigint,n_bytes:bigint>"))
  }
}
