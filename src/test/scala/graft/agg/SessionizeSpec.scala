package graft.agg

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sessionize contract:
  *   - gap semantics (boundary-inclusive: exactly-gap stays in
  *     session, gap+1us breaks);
  *   - null-ts rows are excluded (engines disagree on null ordering);
  *   - an input `_brk` column survives (collision-safe temp names);
  *   - sessionStatsBucketed ≡ sessionStats on fixtures whose sessions
  *     span bucket boundaries (the skew mitigation must not change a
  *     single row), for bucket sizes both above and below the gap;
  *   - bucketed stage-1 partitions by (user, bucket): a hot user's
  *     events split across buckets rather than one window partition.
  */
class SessionizeSpec extends SparkSpec {

  private val gapUs = 3600000000L // 1 h

  private def ev(rows: Seq[(String, String, Int, Double)]): DataFrame = {
    import spark.implicits._
    rows.toDF("user_id", "ts_s", "event_id", "value")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
  }

  private def canon(df: DataFrame): Seq[String] =
    df.select("user_id", "session_seq", "session_start", "session_end",
        "n_events", "duration_us", "total_value")
      .collect().map(_.toString).sorted.toSeq

  test("gap boundary is inclusive: exactly-gap joins, gap+1us breaks") {
    val e = ev(Seq(
      ("u1", "2024-01-01 00:00:00", 1, 1.0),
      ("u1", "2024-01-01 01:00:00", 2, 1.0), // exactly 1 h later: same session
      ("u1", "2024-01-01 02:00:00.000001", 3, 1.0), // 1 h + 1 us: breaks
    ))
    val out = Sessionize.sessionStats(e, "user_id", "ts", "value", gapUs)
      .orderBy("session_seq").collect()
    assert(out.map(_.getLong(out.head.fieldIndex("n_events"))).toSeq == Seq(2L, 1L))
  }

  test("null-ts rows are excluded, matching the oracle's WHERE ts IS NOT NULL") {
    val e = ev(Seq(
      ("u1", "2024-01-01 00:00:00", 1, 1.0),
      ("u1", "2024-01-01 00:30:00", 2, 1.0),
    )).unionByName(
      ev(Seq(("u1", "2024-01-01 00:10:00", 9, 5.0)))
        .withColumn("ts", lit(null).cast("timestamp")))
    val out = Sessionize.sessionStats(e, "user_id", "ts", "value", gapUs).collect()
    assert(out.length == 1)
    assert(out.head.getLong(out.head.fieldIndex("n_events")) == 2L)
    assert(out.head.getDouble(out.head.fieldIndex("total_value")) == 2.0)
  }

  test("an input _brk column survives tagSessions unclobbered") {
    val e = ev(Seq(("u1", "2024-01-01 00:00:00", 1, 1.0)))
      .withColumn("_brk", lit("keep-me"))
    val out = Sessionize.tagSessions(e, "user_id", "ts", gapUs).collect()
    assert(out.head.getString(out.head.fieldIndex("_brk")) == "keep-me")
  }

  // Fixture with sessions deliberately crossing day boundaries: u1 has
  // one session spanning midnight (23:30 → 00:15 next day via 30-min
  // steps), a separate later session, and a chain of three local
  // sessions that must merge pairwise across TWO boundaries when the
  // bucket is small; u2 is all inside one bucket.
  private lazy val boundaryFixture = ev(Seq(
    ("u1", "2024-01-01 23:30:00", 1, 1.5),
    ("u1", "2024-01-02 00:00:00", 2, 2.5),
    ("u1", "2024-01-02 00:15:00", 3, 3.0),
    ("u1", "2024-01-02 06:00:00", 4, 4.0), // new session (5h45m gap)
    ("u2", "2024-01-01 10:00:00", 5, 1.0),
    ("u2", "2024-01-01 10:30:00", 6, 1.0),
    ("u2", "2024-01-01 12:00:00", 7, 9.0), // new session
    // same-ts tie within u2's first session exercises tieBreak
    ("u2", "2024-01-01 10:30:00", 8, 0.25),
  ))

  test("bucketed == plain on boundary-spanning sessions (bucket = 1 day >= gap)") {
    val plain = Sessionize.sessionStats(
      boundaryFixture, "user_id", "ts", "value", gapUs, tieBreak = Seq("event_id"))
    val bucketed = Sessionize.sessionStatsBucketed(
      boundaryFixture, "user_id", "ts", "value", gapUs,
      bucketUs = 86400000000L, tieBreak = Seq("event_id"))
    assert(canon(bucketed) == canon(plain))
  }

  test("bucketed == plain even when bucket < gap (chain merges across 2+ boundaries)") {
    // 10-minute buckets against a 1 h gap: every event lands in its own
    // or a neighboring bucket and stage 2 must chain-merge many locals.
    val plain = Sessionize.sessionStats(
      boundaryFixture, "user_id", "ts", "value", gapUs, tieBreak = Seq("event_id"))
    val bucketed = Sessionize.sessionStatsBucketed(
      boundaryFixture, "user_id", "ts", "value", gapUs,
      bucketUs = 600000000L, tieBreak = Seq("event_id"))
    assert(canon(bucketed) == canon(plain))
  }

  test("bucketed == plain on sf0.001 events (real corpus, 6 h gap, 1 day bucket)") {
    val e = spark.read.parquet(s"$sf0001/events.parquet")
    val g = 21600000000L
    val plain = Sessionize.sessionStats(
      e, "user_id", "ts", "value", g, tieBreak = Seq("event_id"))
    val bucketed = Sessionize.sessionStatsBucketed(
      e, "user_id", "ts", "value", g,
      bucketUs = 86400000000L, tieBreak = Seq("event_id"))
    assert(canon(bucketed) == canon(plain))
  }

  test("law: bucketed == plain on random event sets across random bucket sizes (fixed seeds)") {
    // events with gaps straddling every interesting ratio to the
    // bucket size; any divergence between the one-window semantics and
    // the two-stage plan shows up as a canon mismatch
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val base = 1704067200000000L // 2024-01-01 in micros
      val rows = (0 until 300).map { i =>
        val user = s"u${rnd.nextInt(6)}"
        // jumps from seconds to multiple days, in raw micros
        val ts = base + math.abs(rnd.nextLong() % (10L * 86400000000L))
        (user, ts, i, rnd.nextInt(1000) / 100.0)
      }
      import spark.implicits._
      val e = rows.toDF("user_id", "us", "event_id", "value")
        .withColumn("ts", timestamp_micros(col("us"))).drop("us")
      val gap = 3600000000L * (1 + rnd.nextInt(5)) // 1-5 h
      val bucket = Seq(600000000L, 3600000000L, 86400000000L)(rnd.nextInt(3))
      val plain = Sessionize.sessionStats(e, "user_id", "ts", "value", gap, Seq("event_id"))
      val bucketed = Sessionize.sessionStatsBucketed(
        e, "user_id", "ts", "value", gap, bucket, Seq("event_id"))
      assert(canon(bucketed) == canon(plain), s"seed $seed gap $gap bucket $bucket")
    }
  }

  test("hot user: stage-1 window partitions by (user, bucket), bounding per-task input") {
    // One user, 200 events spread over 50 days. The plain form's
    // window sort sees all 200 in one partition; bucketed stage 1 sees
    // at most the densest day (4 events). Assert the plan partitions
    // the first window by both keys, and that results still agree.
    val hotOk = (0 until 200).map { i =>
      val day = 1 + (i / 8) % 25
      val hour = i % 8
      ("hot", f"2024-01-$day%02d 0$hour:00:00", i, 1.0)
    }
    val e = ev(hotOk)
    val plain = Sessionize.sessionStats(
      e, "user_id", "ts", "value", gapUs, tieBreak = Seq("event_id"))
    val bucketed = Sessionize.sessionStatsBucketed(
      e, "user_id", "ts", "value", gapUs,
      bucketUs = 86400000000L, tieBreak = Seq("event_id"))
    assert(canon(bucketed) == canon(plain))
    val planTxt = Sessionize.sessionStatsBucketed(
      e, "user_id", "ts", "value", gapUs,
      bucketUs = 86400000000L, tieBreak = Seq("event_id"))
      .queryExecution.optimizedPlan.toString
    // the event-level window (the expensive one) must be keyed by
    // user AND bucket — that's the whole mitigation
    assert(planTxt.contains("windowspecdefinition(user_id"), planTxt.take(2000))
    assert(planTxt.toLowerCase.contains("_bucket"), planTxt.take(2000))
  }

  test("skew telemetry: a 50%-hot user fires the rate-limited WARN once, pointing at bucketed") {
    import graft.quality.SkewTelemetry
    SkewTelemetry.reset()
    // 50%-hot corpus: user "hot" contributes 100 of 200 events in ONE
    // contiguous session (events 1 min apart << 1 h gap); 100 other
    // users contribute one event each.
    val rows =
      (0 until 100).map(i => ("hot", f"2024-01-01 ${i / 60}%02d:${i % 60}%02d:00", i, 1.0)) ++
        (0 until 100).map(i => (s"u$i", f"2024-02-${1 + i % 28}%02d 00:00:00", 1000 + i, 1.0))
    val e = ev(rows)
    def run(): Unit = {
      Sessionize.sessionStats(e, "user_id", "ts", "value", gapUs,
        tieBreak = Seq("event_id"), hotSessionMinEvents = 100)
        .write.mode("overwrite").format("noop").save()
      ()
    }
    run()
    // observe() metrics surface after the action; listener runs async
    var tries = 0
    while (SkewTelemetry.lastEvent.isEmpty && tries < 100) { Thread.sleep(50); tries += 1 }
    val ev1 = SkewTelemetry.lastEvent.get
    assert(ev1.metric.contains("sessionize"))
    assert(ev1.oversizedBuckets == 1L, s"hot-user event not flagged: $ev1")
    assert(ev1.maxBucketSize == 100L, s"largest session miscounted: $ev1")
    assert(SkewTelemetry.suppressedWarnings("sessionize") == 0L, "first event must WARN")
    // second run: rate limit folds the repeat into a suppressed DEBUG
    run()
    tries = 0
    while (SkewTelemetry.suppressedWarnings("sessionize") == 0L && tries < 100) {
      Thread.sleep(50); tries += 1
    }
    assert(SkewTelemetry.suppressedWarnings("sessionize") == 1L,
      "repeat hot-user events must be suppressed, not re-WARN")
    // a balanced corpus (no session >= 50%) observes zero hot groups
    SkewTelemetry.reset()
    val balanced = ev((0 until 200).map(i =>
      (s"u${i % 50}", f"2024-03-${1 + i % 28}%02d ${i % 24}%02d:00:00", i, 1.0)))
    Sessionize.sessionStats(balanced, "user_id", "ts", "value", gapUs,
      tieBreak = Seq("event_id"), hotSessionMinEvents = 100)
      .write.mode("overwrite").format("noop").save()
    tries = 0
    while (SkewTelemetry.lastEvent.isEmpty && tries < 100) { Thread.sleep(50); tries += 1 }
    assert(SkewTelemetry.lastEvent.exists(_.oversizedBuckets == 0L))
  }
}
