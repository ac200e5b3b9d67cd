package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.agg.Sessionize

/** Stream ≡ batch for gap-based sessionization: the native
  * session_window form (with the +1-micro boundary adjustment) must
  * emit exactly the sessions the batch operator computes, per-field.
  *
  * Harness shape: the fixture arrives as time-ordered parquet chunks
  * (maxFilesPerTrigger=1 → one micro-batch each); an append-mode file
  * sink emits a session only once the watermark passes its end + gap,
  * and the watermark itself commits one batch late — so a far-future
  * SENTINEL event (a throwaway user) pushes the global watermark past
  * every real session, and a second AvailableNow drain (same
  * checkpoint) flushes the emissions. Real-user rows are then compared
  * to the batch output exactly.
  */
class StreamingSessionizeSpec extends SparkSpec {

  private val GapUs = 600000000L // 10 min
  private val Sentinel = "__sentinel"

  private def ts(ms: Long) = new Timestamp(ms)

  // (user, ts-millis, value) — three users exercising the boundary:
  //   u1: e1..e2 exactly GapUs apart (MUST merge: boundary-inclusive),
  //       e3 at gap+1ms (new session)
  //   u2: single-event session, then a 2-event session far later
  //   u3: interleaved with u1 in time (state keeps both open at once)
  private val t0 = 1706745600000L // 2024-02-01 00:00:00 UTC
  private val chunk1 = Seq(
    ("u1", t0, 1.5), ("u3", t0 + 1000, 10.0),
    ("u1", t0 + GapUs / 1000, 2.25), // exactly gapUs after e1
    ("u2", t0 + 2000, 5.0),
    ("u3", t0 + 300000, 0.75),
  )
  private val chunk2 = Seq(
    ("u1", t0 + GapUs / 1000 + GapUs / 1000 + 1, 4.0), // gap+1ms → breaks
    ("u2", t0 + 7200000, 1.0), ("u2", t0 + 7260000, 2.0),
  )

  /** Stage one chunk as a FLAT parquet file in the input dir (the
    * file stream source lists leaf files; a nested write.parquet dir
    * would be invisible). Lexicographic names keep arrival order
    * deterministic even under mod-time ties. */
  private def stageChunk(
      dir: java.nio.file.Path,
      rows: Seq[(String, Long, Double)],
      name: String): Unit = {
    import spark.implicits._
    val scratch = Files.createTempDirectory("graft-ssess-chunk").toString
    rows.map { case (u, ms, v) => (u, ts(ms), v) }
      .toDF("user_id", "ts", "value")
      .coalesce(1).write.mode("overwrite").parquet(scratch)
    val part = new java.io.File(scratch).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .getOrElse(fail(s"no part file written under $scratch"))
    Files.copy(part.toPath, dir.resolve(s"$name.parquet"))
    ()
  }

  private def batchDf: DataFrame = {
    import spark.implicits._
    (chunk1 ++ chunk2).map { case (u, ms, v) => (u, ts(ms), v) }
      .toDF("user_id", "ts", "value")
  }

  private def collectSessions(df: DataFrame): Set[(String, Long, Long, Long, Long, Double)] =
    df.collect().map { r =>
      (r.getAs[String]("user_id"),
        r.getAs[Timestamp]("session_start").getTime,
        r.getAs[Timestamp]("session_end").getTime,
        r.getAs[Long]("n_events"),
        r.getAs[Long]("duration_us"),
        r.getAs[Double]("total_value"))
    }.toSet

  test("streamed session_window sessions equal the batch operator's, field for field") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft-ssess-in")
    val ckpt = Files.createTempDirectory("graft-ssess-ck").toString
    val out = Files.createTempDirectory("graft-ssess-out").toString + "/sessions"
    stageChunk(in, chunk1, "c1")
    stageChunk(in, chunk2, "c2")

    def drain(): Unit = {
      val stream = spark.readStream
        .schema("user_id STRING, ts TIMESTAMP, value DOUBLE")
        .option("maxFilesPerTrigger", 1)
        .parquet(in.toString)
      StreamingSessionize.sessionStats(stream, "user_id", "ts", "value",
          GapUs, watermarkDelay = "0 seconds")
        .writeStream
        .format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    }

    // sentinel #1 pushes the watermark past every real session's
    // end + gap; sentinel #2 (second drain) closes sentinel #1's own
    // session and flushes the one-batch-late watermark commit
    def sentinel(name: String, offsetDays: Int): Unit =
      stageChunk(in, Seq((Sentinel, t0 + offsetDays * 86400000L, 0.0)), name)

    sentinel("s1", 10)
    drain()
    sentinel("s2", 20)
    drain()

    val streamed = collectSessions(
      spark.read.parquet(out).filter($"user_id" =!= Sentinel))
    val batch = collectSessions(
      Sessionize.sessionStats(batchDf, "user_id", "ts", "value", GapUs)
        .select("user_id", "session_start", "session_end",
          "n_events", "duration_us", "total_value"))

    assert(batch.nonEmpty)
    // the boundary-inclusive merge really is in the fixture: u1's
    // exactly-gapUs pair forms ONE 2-event session in the batch truth
    assert(batch.exists(s => s._1 == "u1" && s._4 == 2L && s._5 == GapUs))
    assert(streamed == batch)
  }

  test("session_seq-free schema matches the batch stats minus the ordinal") {
    val stream = spark.readStream
      .schema("user_id STRING, ts TIMESTAMP, value DOUBLE")
      .parquet(Files.createTempDirectory("graft-ssess-schema").toString)
    val df = StreamingSessionize.sessionStats(stream, "user_id", "ts", "value", GapUs)
    assert(df.columns.toSeq == Seq("user_id", "session_start", "session_end",
      "n_events", "duration_us", "total_value"))
    assert(df.isStreaming)
  }
}
