package graft

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import scala.util.control.NonFatal

/** Automated interleaved re-pair — the 4cb35fa / ADJUDICATION_R10
  * protocol as a harness step instead of a manual session.
  *
  * Problem it closes: the driver bench's dispersion gate (best-3 round
  * totals within a bound — 5% through r13, recalibrated to the measured
  * 10% host floor in r14) failed two rounds running on a co-tenant host, and
  * each time the round-over-round delta had to be adjudicated BY HAND
  * as "host drift, not code" via an interleaved A/B of the two HEADs.
  * This object runs that exact protocol automatically: spawn fresh
  * JVMs alternating CURRENT head (this classpath) and PREVIOUS round's
  * head (a classes jar snapshotted by tools/snapshot_prevhead.sh at
  * the prior round's final commit), each benching the same small
  * flagship subset on the same host session, and emit
  * `ADJUDICATION_R{N}.json` bracketing the code-vs-host split:
  *
  *   - per-query ratio prev/current (min across that head's two JVMs,
  *     each itself a min over >= 3 interleaved timed rounds) — the
  *     CODE delta, host conditions held equal by the interleave;
  *   - same-head run-over-run ratios (A1/A2, B1/B2) — the HOST noise
  *     bracket on this session.
  *
  * [[Bench.main]] invokes [[run]] only when its own gate fails at
  * budget exhaustion, as OVERTIME past the timed budget (lazy since
  * round 13 — the unconditional carve cut r12's timed rounds 7 → 3 and
  * caused the spread it existed to adjudicate; the bench line is
  * already printed and flushed before the overtime starts, so a kill
  * here loses only this artifact). The subset is the three most
  * expensive stable queries (they carry the suite's signal; the 140+
  * sub-second queries carry its noise).
  *
  * Fairness: the parent Spark session is STOPPED before the first
  * child spawns — children alternate on an otherwise-idle JVM slate,
  * and every child gets identical flags (same -Xmx, same add-opens,
  * same env knobs) with only the classpath differing.
  */
object Adjudicate {

  /** Flagship subset: the top-3 most expensive queries of the r11
    * driver bench (td10 6.1s, t12 5.9s, t11 4.0s at sf0.1) — three
    * independent code families (graph CC delta-iteration, classifier
    * training, inverted-index top-k) so a code regression in any hot
    * path moves at least one of them. Must exist in BOTH heads. */
  val DefaultSubset: Seq[String] =
    Seq("td10_dup_clusters", "t12_quality_filter", "t11_bm25_topk")

  /** Previous-round head jar + its commit, if snapshotted. */
  def prevJar(): Option[(File, String)] = {
    val jar = new File(sys.env.getOrElse(
      "SPARK_GRAFT_PREV_JAR", "tools/prevhead/graft-prev.jar"))
    if (!jar.isFile) None
    else {
      val meta = new File(jar.getParentFile, "meta.json")
      val commit =
        if (!meta.isFile) "unknown"
        else "\"commit\"\\s*:\\s*\"([0-9a-f]+)\"".r
          .findFirstMatchIn(new String(
            Files.readAllBytes(meta.toPath), StandardCharsets.UTF_8))
          .map(_.group(1)).getOrElse("unknown")
      Some((jar, commit))
    }
  }

  /** This build's classpath entry (classes dir under sbt, jar under
    * direct java) — the CURRENT-head side of the pair. */
  def currentCodeEntry(): String =
    new File(getClass.getProtectionDomain.getCodeSource.getLocation.toURI)
      .getAbsolutePath

  private def javaExe: String =
    new File(new File(System.getProperty("java.home"), "bin"), "java")
      .getAbsolutePath

  /** Same module opens build.sbt / tools/runmain.sh pass — a child
    * differing only in classpath must differ ONLY in classpath. */
  private val addOpens: Seq[String] = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  /** One child bench JVM: graft.Bench over `queries` at `sfDir`,
    * full-suite-interleaved rounds inside the child (its own min-3
    * rounds logic), JSON to `outFile`. Returns the per-query min map,
    * or None on failure/timeout. Child stdout/stderr go to
    * `outFile.log` — the parent's stdout must stay parseable. */
  private def runChild(
      classpathEntry: String,
      sfDir: String,
      queries: Seq[String],
      outFile: File,
      timeoutSec: Long,
  ): Option[Map[String, Double]] = {
    val cmd: Seq[String] =
      Seq(javaExe) ++ addOpens ++ Seq(
        "-Dspark.ui.enabled=false",
        "-Dspark.sql.session.timeZone=UTC",
        s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
        // Spark jars dir shared with tools/runmain.sh — overridable so
        // a host with Spark elsewhere doesn't silently degrade every
        // adjudication to "incomplete" via child classpath failures.
        "-cp", s"$classpathEntry:${sys.env.getOrElse("SPARK_GRAFT_SPARK_JARS", "/opt/spark/jars")}/*",
        "graft.Bench")
    val pb = new ProcessBuilder(cmd: _*)
    val env = pb.environment()
    env.put("SPARK_GRAFT_SF_DIR", sfDir)
    env.put("SPARK_GRAFT_BENCH_QUERIES", queries.mkString(","))
    env.put("SPARK_GRAFT_BENCH_OUT", outFile.getAbsolutePath)
    // small budget: the child still runs its hard minimum of 3 timed
    // rounds (Bench.wantMore is unconditional below minRounds); the
    // budget only stops it from chasing ITS OWN convergence — the
    // parent's cross-JVM min handles that
    env.put("SPARK_GRAFT_BENCH_BUDGET_SEC", "60")
    env.put("SPARK_GRAFT_NO_ADJUDICATE", "1")
    val log = new File(outFile.getAbsolutePath + ".log")
    pb.redirectOutput(ProcessBuilder.Redirect.to(log))
    pb.redirectErrorStream(true)
    val p = pb.start()
    val done = p.waitFor(timeoutSec, java.util.concurrent.TimeUnit.SECONDS)
    if (!done) {
      p.destroyForcibly()
      System.err.println(s"[adjudicate] child timed out after ${timeoutSec}s: $classpathEntry")
      None
    } else if (p.exitValue() != 0) {
      System.err.println(s"[adjudicate] child exit ${p.exitValue()}: $classpathEntry (log: $log)")
      None
    } else parseQueries(outFile)
  }

  /** Per-query times from a child's BENCH_FULL-shaped JSON. */
  private[graft] def parseQueries(f: File): Option[Map[String, Double]] =
    try {
      import org.json4s._
      import org.json4s.jackson.JsonMethods
      val root = JsonMethods.parse(
        new String(Files.readAllBytes(f.toPath), StandardCharsets.UTF_8))
      root \ "queries" match {
        case JObject(fields) =>
          Some(fields.collect {
            case (k, JDouble(v)) => k -> v
            case (k, JInt(v)) => k -> v.toDouble
            case (k, JDecimal(v)) => k -> v.toDouble
          }.toMap)
        case _ => None
      }
    } catch { case NonFatal(_) => None }

  /** Round number for the artifact name: env override, else one past
    * the newest committed BENCH_r{N}.json (the driver writes that file
    * AFTER the bench, so during round N the max on disk is N-1). */
  def roundNumber(): Int =
    sys.env.get("SPARK_GRAFT_ROUND").flatMap(s => scala.util.Try(s.toInt).toOption)
      .getOrElse {
        val rs = Option(new File(".").listFiles()).getOrElse(Array.empty)
          .flatMap(f => "^BENCH_r0*([0-9]+)\\.json$".r
            .findFirstMatchIn(f.getName).map(_.group(1).toInt))
        if (rs.isEmpty) 0 else rs.max + 1
      }

  /** Minimal JSON string escaping for the artifact's free-text fields
    * (reason/verdict): quotes, backslashes and control chars — a
    * future reason containing a quote must not produce an invalid
    * ADJUDICATION artifact. */
  private[graft] def jsonEscape(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => "\\u%04x".format(c.toInt)
      case c => c.toString
    }

  /** True when `prevCommit`'s SOURCE is identical to HEAD's — the
    * end-of-round self-pair case: the prev-head jar is re-stamped at
    * the round's final commit and the snapshot/artifact commits that
    * follow touch no source, so commit hashes differ while the two
    * jars are code-identical. `git diff --quiet` exit 0 = no diff;
    * any git failure reads as a REAL pair (fail toward comparing). */
  private[graft] def sameCodeAsHead(
      prevCommit: String, repoDir: File = new File(".")): Boolean =
    prevCommit != "unknown" && (
      try {
        val p = new ProcessBuilder(
          "git", "diff", "--quiet", prevCommit, "HEAD", "--", "src/main", "build.sbt")
          .directory(repoDir).start()
        p.waitFor() == 0
      } catch { case NonFatal(_) => false })

  /** Uncommitted changes over the compared paths: a committed-tree
    * diff that reads clean is NOT evidence of a self-pair when the
    * bench runs from a dirty working tree — the classes under test may
    * differ from HEAD. Any git failure reads as dirty (fail toward the
    * real-pair label, same direction as [[sameCodeAsHead]]).
    * `repoDir` exists for the spec (a synthetic temp repo); production
    * callers use the default working directory. */
  private[graft] def workingTreeDirty(repoDir: File = new File(".")): Boolean =
    try {
      val p = new ProcessBuilder(
        "git", "status", "--porcelain", "--", "src/main", "build.sbt")
        .directory(repoDir).start()
      val out = new String(p.getInputStream.readAllBytes(), StandardCharsets.UTF_8)
      p.waitFor() != 0 || out.trim.nonEmpty
    } catch { case NonFatal(_) => true }

  private def gitHead(): String =
    try {
      val p = new ProcessBuilder("git", "rev-parse", "HEAD").start()
      val out = new String(p.getInputStream.readAllBytes(), StandardCharsets.UTF_8).trim
      if (p.waitFor() == 0 && out.nonEmpty) out else "unknown"
    } catch { case NonFatal(_) => "unknown" }

  /** Run the A,B,A,B re-pair under a wall reserve; write
    * `ADJUDICATION_R{N}.json`. Returns the artifact path on success.
    * Never throws: adjudication is best-effort evidence — a failure
    * must not take down the bench line that triggered it. */
  def run(
      sfDir: String,
      queries: Seq[String] = DefaultSubset,
      reserveSec: Double = 480.0,
      reason: String = "dispersion gate failed",
  ): Option[String] =
    try {
      val (jar, prevCommit) = prevJar().getOrElse {
        System.err.println("[adjudicate] no prev-head jar; skipping"); return None
      }
      val cur = currentCodeEntry()
      val n = roundNumber()
      val deadline = System.nanoTime() + (reserveSec * 1e9).toLong
      def leftSec: Long = math.max((deadline - System.nanoTime()) / 1000000000L, 0L)
      val tmp = Files.createTempDirectory("adjudicate").toFile
      // A = current head, B = previous head, interleaved on one host
      // session; per-child cap sized so four children fit the reserve.
      // The cap ADAPTS to the first completed child's measured wall
      // (r15: on a ~2x-degraded host the fixed reserve/4*1.4 cap
      // starved both B children at 168 s while A1 had measured 135 s —
      // the next child clearly needed ~the same, not a starved stub).
      // One complete A and one complete B beat four starved children:
      // the ratio computes from any one completed JVM per head, so a
      // late child running out of reserve costs only bracket depth.
      val perChildCap = math.max((reserveSec / 4 * 1.4).toLong, 60L)
      var maxChildSec = 0L
      val plan = Seq(
        ("A1_current", cur), ("B1_prev", jar.getAbsolutePath),
        ("A2_current", cur), ("B2_prev", jar.getAbsolutePath))
      val runs: Seq[(String, Option[Map[String, Double]])] = plan.map {
        case (label, cp) =>
          if (leftSec < 30) {
            System.err.println(s"[adjudicate] reserve exhausted before $label")
            (label, None)
          } else {
            val cap = math.min(
              math.max(perChildCap, maxChildSec * 3 / 2), leftSec + 10)
            System.err.println(s"[adjudicate] $label starting (${leftSec}s left, cap ${cap}s)")
            val t0 = System.nanoTime()
            val r = runChild(cp, sfDir, queries,
              new File(tmp, s"$label.json"), cap)
            if (r.isDefined)
              maxChildSec = math.max(maxChildSec, (System.nanoTime() - t0) / 1000000000L)
            (label, r)
          }
      }
      val byLabel = runs.toMap
      def headMin(labels: Seq[String]): Map[String, Double] = {
        val maps = labels.flatMap(byLabel(_))
        queries.flatMap { q =>
          val vs = maps.flatMap(_.get(q)); if (vs.isEmpty) None else Some(q -> vs.min)
        }.toMap
      }
      val aMin = headMin(Seq("A1_current", "A2_current"))
      val bMin = headMin(Seq("B1_prev", "B2_prev"))
      def f3(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
      def mapJson(m: Map[String, Double]) =
        m.toSeq.sortBy(_._1)
          .map { case (k, v) => "\"" + jsonEscape(k) + "\":" + f3(v) }
          .mkString("{", ",", "}")
      // End-of-round protocol artifact: the prev-head jar is re-stamped
      // at each round's FINAL commit so the NEXT round pairs against
      // it. A bench that fires adjudication AT that final commit (the
      // driver's own round-end run) therefore pairs the head against
      // itself — a legitimate same-host noise bracket, but any
      // "code improvement/regression" wording would be fiction. Detect
      // and label it; the ratio fields stay (they ARE the bracket).
      // A DIRTY working tree over the compared paths voids the
      // detection: the committed diff reads clean while the classes
      // under test differ from HEAD — label as a real pair, noted.
      val commitsSame = sameCodeAsHead(prevCommit)
      val dirty = commitsSame && workingTreeDirty()
      val selfPair = commitsSame && !dirty
      val dirtyNote =
        if (dirty) " [NOTE: prev commit matches HEAD but the working " +
          "tree is dirty over src/main|build.sbt - the current-head " +
          "classes may differ from HEAD, so this is labeled a real " +
          "pair, not a same-head bracket]"
        else ""
      val complete = queries.forall(q => aMin.contains(q) && bMin.contains(q))
      val (ratioJson, verdict) =
        if (!complete) ("null", "incomplete: a child run failed or the reserve ran out; no ratio")
        else if (selfPair) {
          val at = queries.map(aMin).sum
          val bt = queries.map(bMin).sum
          val perQ = queries.map(q => q -> bMin(q) / aMin(q)).toMap
          (s""""total_current_sec":${f3(at)},"total_prev_sec":${f3(bt)},""" +
            s""""ratio_prev_over_current":${f3(bt / at)},""" +
            s""""per_query_ratio_prev_over_current":${mapJson(perQ)}""",
            f"SAME-HEAD pair (prev jar is this commit): ratio ${bt / at}%.3f is a pure host-noise bracket, NOT a code delta - read the code comparison from the previous round's committed ADJUDICATION artifact")
        } else {
          val at = queries.map(aMin).sum
          val bt = queries.map(bMin).sum
          val ratio = bt / at
          val perQ = queries.map(q => q -> bMin(q) / aMin(q)).toMap
          val v =
            if (ratio >= 0.95 && ratio <= 1.05)
              f"code-neutral: prev/current total ratio ${ratio}%.3f within 5%% - the sf0.1 dispersion is host noise, not a code delta"
            else if (ratio < 0.95)
              f"code regression indicated: current head ${1 / ratio}%.3fx slower than previous head on the flagship subset"
            else
              f"code improvement: current head ${ratio}%.3fx faster than previous head on the flagship subset"
          (s""""total_current_sec":${f3(at)},"total_prev_sec":${f3(bt)},""" +
            s""""ratio_prev_over_current":${f3(ratio)},""" +
            s""""per_query_ratio_prev_over_current":${mapJson(perQ)}""", v + dirtyNote)
        }
      def sameHeadBracket(l1: String, l2: String): String =
        (byLabel(l1), byLabel(l2)) match {
          case (Some(m1), Some(m2)) if queries.forall(q => m1.contains(q) && m2.contains(q)) =>
            f3(queries.map(m1).sum / queries.map(m2).sum)
          case _ => "null"
        }
      val runsJson = runs.map { case (l, m) =>
        "\"" + l + "\":" + m.map(mapJson).getOrElse("null")
      }.mkString("{", ",", "}")
      val json =
        s"""{"protocol":"automated interleaved same-host re-pair (4cb35fa protocol, harness-invoked): current HEAD vs prev-round HEAD jar, fresh JVMs alternating A,B,A,B, flagship subset, per-head value = min over its two JVMs (each min over >=3 interleaved timed rounds)",""" +
          s""""trigger":"${jsonEscape(reason)}",""" +
          s""""date_utc":"${java.time.Instant.now().toString.take(19)}Z",""" +
          // every free-form interpolation is escaped: sfDir and the
          // query names arrive from env vars, and commit/head strings
          // from git output — a quote or backslash in any of them must
          // not produce an invalid artifact
          s""""commit_current":"${jsonEscape(gitHead())}","commit_prev":"${jsonEscape(prevCommit)}",""" +
          s""""sf":"${jsonEscape(sfDir)}","queries":[${queries.map(q => "\"" + jsonEscape(q) + "\"").mkString(",")}],""" +
          s""""runs":$runsJson,""" +
          (if (complete) ratioJson + ","
           else """"ratio_prev_over_current":null,""") +
          s""""host_bracket_same_head":{"A1_over_A2":${sameHeadBracket("A1_current", "A2_current")},"B1_over_B2":${sameHeadBracket("B1_prev", "B2_prev")}},""" +
          s""""verdict":"${jsonEscape(verdict)}"}"""
      val out = s"ADJUDICATION_R$n.json"
      Files.write(Paths.get(out), (json + "\n").getBytes(StandardCharsets.UTF_8))
      System.err.println(s"[adjudicate] wrote $out - $verdict")
      Some(out)
    } catch {
      case NonFatal(e) =>
        System.err.println(s"[adjudicate] failed: $e")
        None
    }

  /** Manual entry point (the ask-#5 style one-off pairs):
    * env SPARK_GRAFT_SF_DIR, optional SPARK_GRAFT_BENCH_QUERIES /
    * SPARK_GRAFT_PREV_JAR / SPARK_GRAFT_ROUND /
    * SPARK_GRAFT_ADJ_RESERVE_SEC. */
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val queries = sys.env.get("SPARK_GRAFT_BENCH_QUERIES")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(DefaultSubset)
    val reserve = sys.env.get("SPARK_GRAFT_ADJ_RESERVE_SEC")
      .flatMap(s => scala.util.Try(s.toDouble).toOption).getOrElse(480.0)
    val ok = run(sfDir, queries, reserve, reason = "manual invocation")
    if (ok.isEmpty) sys.exit(1)
  }
}
