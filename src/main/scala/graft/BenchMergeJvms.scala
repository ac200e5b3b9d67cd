package graft

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.util.control.NonFatal

/** Merge N per-JVM [[Bench]] artifacts into one cross-JVM bench file.
  *
  * Protocol context: the round-13 td10 probe (MEASUREMENTS_R13.json,
  * `td10_sf10_bimodality`) measured fresh-JVM minima of a single sf10
  * query spreading ±4.8% on identical code and wrote the consequence
  * into the artifact — sf10 measurements need ≥3 fresh JVMs, because
  * one JVM's converged in-process rounds still share that JVM's C2
  * tier, heap layout and host window. This main implements the merge
  * half of that protocol: each JVM runs the full `graft.Bench`
  * machinery (warm-up, untimed passes, ≥3 interleaved timed rounds,
  * per-query min) and this merges their artifacts so the committed
  * file carries BOTH the cross-JVM min-composite and the per-JVM
  * provenance needed to judge its stability.
  *
  * Usage: `runMain graft.BenchMergeJvms <out.json> <in1.json> <in2.json> [...]`
  *
  * Merged semantics (superset of the Bench schema, so existing
  * readers keep working):
  *   - `queries`      — per-query MIN across the JVMs' per-query mins
  *                      (same estimator Bench uses across rounds, one
  *                      level up; a query missing from one JVM but
  *                      timed in another keeps the samples it has)
  *   - `min_value`    — sum of the merged per-query mins (the
  *                      cross-JVM min-composite)
  *   - `steady_value` / `robust_value` — MEDIAN across JVMs of the
  *                      per-JVM statistic: a cross-JVM "round total
  *                      that actually happened", immune to one lucky
  *                      or one stalled JVM
  *   - `jvm_spread_pct` — (max−min)/min over the JVMs' own
  *                      min-composites: the fresh-JVM amplitude the
  *                      td10 probe demanded visibility of
  *   - `dispersion_ok` — true only when EVERY JVM's in-process gate
  *                      passed; the per-JVM verdicts sit in `per_jvm`
  *   - `value`        — min-composite when dispersion_ok (source
  *                      "min_composite_multi_jvm"), else the median
  *                      steady_value (source "steady")
  *   - `failed`       — queries that succeeded in NO JVM (loudly
  *                      absent from the times, as in Bench)
  *   - `rounds`       — total timed rounds across all JVMs
  *
  * `sf` and `skipped_baseline` must agree across inputs (fail loudly
  * otherwise — merging two different corpora is never meaningful). */
object BenchMergeJvms {

  final case class JvmBench(
      path: String,
      sf: String,
      queries: Map[String, Double],
      minValue: Double,
      steadyValue: Double,
      robustValue: Double,
      rounds: Int,
      spreadPct: Double,
      dispersionOk: Boolean,
      skipped: Seq[String],
      failed: Seq[String])

  import org.json4s._
  import org.json4s.jackson.JsonMethods

  private def num(v: JValue): Option[Double] = v match {
    case JDouble(d)  => Some(d)
    case JInt(i)     => Some(i.toDouble)
    case JDecimal(d) => Some(d.toDouble)
    case JLong(l)    => Some(l.toDouble)
    case _           => None
  }

  private def strings(v: JValue): Seq[String] = v match {
    case JArray(xs) => xs.collect { case JString(s) => s }
    case _          => Seq.empty
  }

  def read(path: String): JvmBench = {
    val root = JsonMethods.parse(new String(
      Files.readAllBytes(Paths.get(path)), StandardCharsets.UTF_8))
    val qs = root \ "queries" match {
      case JObject(fields) =>
        fields.flatMap { case (k, v) => num(v).map(k -> _) }.toMap
      case _ => Map.empty[String, Double]
    }
    require(qs.nonEmpty, s"$path: no per-query times — not a Bench artifact")
    def d(field: String): Double =
      num(root \ field).getOrElse(
        sys.error(s"$path: missing numeric field '$field'"))
    JvmBench(
      path = path,
      sf = (root \ "sf") match { case JString(s) => s; case _ => "" },
      queries = qs,
      minValue = d("min_value"),
      steadyValue = d("steady_value"),
      robustValue = d("robust_value"),
      rounds = d("rounds").toInt,
      spreadPct = d("spread_pct"),
      dispersionOk = (root \ "dispersion_ok") == JBool(true),
      skipped = strings(root \ "skipped_baseline"),
      failed = strings(root \ "failed"))
  }

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    s(s.size / 2)
  }

  /** Pure merge — exercised directly by the spec. Returns the merged
    * JSON line (exact file content minus trailing newline). */
  def merge(jvms: Seq[JvmBench]): String = {
    // 1 input is legal (a wall-bounded campaign that cut its optional
    // bracket JVMs still ships a normalized artifact: merged == the
    // single JVM, cross-JVM spread 0) — the r14 campaign died under
    // set -e when JVM C was cut because this required 2.
    require(jvms.nonEmpty, "need at least one per-JVM artifact to merge")
    require(jvms.map(_.sf).distinct.size == 1,
      s"inputs disagree on sf dir: ${jvms.map(b => s"${b.path}=${b.sf}").mkString(", ")}")
    require(jvms.map(_.skipped.sorted).distinct.size == 1,
      "inputs disagree on the skip list — different query surfaces")

    def f3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)

    val names = jvms.flatMap(_.queries.keys).distinct.sorted
    val merged: Seq[(String, Double)] =
      names.map(n => n -> jvms.flatMap(_.queries.get(n)).min)
    val minComposite = merged.map(_._2).sum
    val steady = median(jvms.map(_.steadyValue))
    val robust = median(jvms.map(_.robustValue))
    val jvmMins = jvms.map(_.minValue)
    val jvmSpreadPct = (jvmMins.max - jvmMins.min) / jvmMins.min * 100.0
    val allOk = jvms.forall(_.dispersionOk)
    // failed = failed EVERYWHERE; a query timed by any JVM has a
    // sample. (Bench lists per-JVM failures; intersect semantics.)
    val failed = jvms.map(_.failed.toSet).reduce(_ intersect _).toSeq.sorted
    val (value, valueSource) =
      if (allOk) (minComposite, "min_composite_multi_jvm")
      else (steady, "steady")

    val qs = merged.map { case (k, v) => "\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    val perJvm = jvms.map { b =>
      s"""{"min_value":${f3(b.minValue)},"steady_value":${f3(b.steadyValue)},""" +
        s""""robust_value":${f3(b.robustValue)},"rounds":${b.rounds},""" +
        s""""spread_pct":${f3(b.spreadPct)},"dispersion_ok":${b.dispersionOk}}"""
    }.mkString("[", ",", "]")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val skippedJson = jvms.head.skipped.map("\"" + _ + "\"").mkString("[", ",", "]")

    s"""{"metric":"suite_seconds","value":${f3(value)},"unit":"sec",""" +
      s""""jvms":${jvms.size},"jvm_spread_pct":${f3(jvmSpreadPct)},""" +
      // the round-count claim is DERIVED from the inputs — a
      // single-JVM merge or a MIN_ROUNDS-reduced campaign (1-2 rounds
      // per JVM) must not ship a ">=3 rounds" provenance string
      s""""protocol":"per-query min over ${jvms.size} fresh JVM${if (jvms.size == 1) "" else "s"}, each a full graft.Bench run (${jvms.map(_.rounds).min}-${jvms.map(_.rounds).max} timed rounds per JVM); MEASUREMENTS_R13 td10 consequence",""" +
      s""""rounds":${jvms.map(_.rounds).sum},""" +
      s""""dispersion_ok":$allOk,"value_source":"$valueSource",""" +
      s""""min_value":${f3(minComposite)},"robust_value":${f3(robust)},""" +
      s""""steady_value":${f3(steady)},""" +
      s""""per_jvm":$perJvm,"failed":$failedJson,""" +
      s""""skipped_baseline":$skippedJson,""" +
      s""""queries":$qs,"sf":"${jvms.head.sf}"}"""
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: BenchMergeJvms <out.json> <in1.json> [in2.json ...]")
    val out = args(0)
    val jvms = args.drop(1).toSeq.map { p =>
      try read(p)
      catch {
        case NonFatal(e) =>
          sys.error(s"cannot read bench artifact $p: ${e.getMessage}")
      }
    }
    val json = merge(jvms)
    Files.write(Paths.get(out),
      (json + "\n").getBytes(StandardCharsets.UTF_8))
    System.err.println(s"[merge] ${jvms.size} JVMs -> $out")
    println(json)
  }
}
