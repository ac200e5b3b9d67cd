package graft.quality

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Hot-bucket telemetry for the skew-gated LSH paths (no-silent-caps
  * principle): whenever a bucketed operator routes oversized groups
  * through its linear fall-through, the counts are collected as an
  * `observe()` metric inside the SAME query (zero extra jobs, zero
  * extra scans) and surfaced here after the action completes — as a
  * WARN log line and as [[lastEvent]] for programmatic/spec access.
  *
  * An adversarial or boilerplate-heavy corpus at 100 TB WILL produce
  * hot buckets; the design goal is that the engine's response (linear
  * representative verification instead of a B² pair enumeration) is
  * observable, never quadratic-by-surprise and never a silent recall
  * cliff. `skippedPairs` quantifies exactly what the cap declined to
  * enumerate: Σ over oversized buckets of (B−1)(B−2)/2 — all-pairs
  * minus the B−1 representative candidates that still ran. */
object SkewTelemetry {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** One observed skew event: `metric` is the observation name
    * (operator-scoped prefix + call counter). */
  final case class SkewEvent(
      metric: String,
      oversizedBuckets: Long,
      maxBucketSize: Long,
      skippedPairs: Long,
  )

  /** Prefix every skew observation name carries; the listener ignores
    * all other observed metrics. */
  val MetricPrefix = "graft_skew_"

  private val callSeq = new AtomicLong(0)
  // weak keys: the registry must not pin discarded sessions
  // (session-per-job services) in memory forever; the listener itself
  // captures no session reference, so the session stays collectable.
  private val registered = java.util.Collections.synchronizedSet(
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()))
  @volatile private var last: Option[SkewEvent] = None

  /** Recent events keyed by metric name, bounded: two concurrently
    * completing gated queries must not clobber each other's report
    * (the single `lastEvent` slot can), and a bench run firing
    * hundreds of observations must not grow without bound —
    * insertion-order eviction past [[RecentCap]]. */
  private val RecentCap = 64
  private val recent =
    new java.util.LinkedHashMap[String, SkewEvent](RecentCap, 0.75f, false) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, SkewEvent]): Boolean = size() > RecentCap
    }

  /** Per-operator-family WARN rate limit: the first oversized-bucket
    * event for a family (metric name minus the call counter) logs at
    * WARN with full detail; repeats fold into a suppressed counter and
    * log at DEBUG. At production scale an adversarial corpus fires the
    * gate on every micro-batch — one WARN per site per session keeps
    * the signal above the flood it would otherwise become. */
  private val warned = new java.util.concurrent.ConcurrentHashMap[String, AtomicLong]()

  /** Most recent skew observation in this JVM (None until a gated
    * operator has run an action). Volatile read — specs poll it. */
  def lastEvent: Option[SkewEvent] = last

  /** The event observed under `metric`, if still within the bounded
    * recent window — the race-free alternative to [[lastEvent]] for
    * programmatic consumers that know their observation name. */
  def eventFor(metric: String): Option[SkewEvent] =
    recent.synchronized(Option(recent.get(metric)))

  /** WARN lines suppressed so far for an operator family (e.g.
    * "minhash") — 0 until the second oversized event for that family. */
  def suppressedWarnings(family: String): Long =
    Option(warned.get(family)).map(_.get()).getOrElse(0L)

  /** Test hook: forget past events so a spec can assert on its own. */
  def reset(): Unit = {
    last = None
    recent.synchronized(recent.clear())
    warned.clear()
  }

  /** `graft_skew_minhash_13` → `minhash`: the rate-limit key. */
  private[quality] def familyOf(metric: String): String =
    metric.stripPrefix(MetricPrefix).replaceAll("_\\d+$", "")

  /** Advice appended to the bucket-cap WARN when a family registered
    * none — phrased for the LSH/semdedup gates that established the
    * pattern. */
  val DefaultAdvice: String =
    "Raise the operator's size cap for exact all-pairs semantics on " +
      "these groups, or re-partition the space (wider banding / more " +
      "centroids) to shrink them."

  private val advice = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Family-specific remediation text for the one WARN that family
    * gets per session (e.g. sessionize points at its bucketed
    * variant; the default text talks LSH caps). First registration
    * wins; idempotent per family. */
  def registerAdvice(family: String, text: String): Unit = {
    advice.putIfAbsent(family, text)
    ()
  }

  /** Unique-within-query observation name. Spark requires observation
    * names be unique per query; a JVM-wide counter keeps two dedup
    * calls composed into one plan distinct. */
  def nextMetricName(op: String): String =
    s"$MetricPrefix${op}_${callSeq.incrementAndGet()}"

  /** Idempotently attach the listener to a session. Called by every
    * gated operator — cheap after the first call. */
  def ensureRegistered(spark: SparkSession): Unit =
    if (registered.add(spark)) {
      spark.listenerManager.register(new QueryExecutionListener {
        override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
          qe.observedMetrics.foreach { case (name, row) =>
            if (name.startsWith(MetricPrefix)) {
              def at(i: Int): Long = if (row.isNullAt(i)) 0L else row.getLong(i)
              val ev = SkewEvent(name, at(0), at(1), at(2))
              last = Some(ev)
              recent.synchronized(recent.put(name, ev): Unit)
              if (ev.oversizedBuckets > 0) {
                val family = familyOf(name)
                val prior = warned.putIfAbsent(family, new AtomicLong(0))
                if (prior == null) {
                  val declined =
                    if (ev.skippedPairs > 0)
                      s"; routed through the linear representative path, " +
                        s"declining ${ev.skippedPairs} candidate pair(s)"
                    else ""
                  val remedy = Option(advice.get(family)).getOrElse(DefaultAdvice)
                  log.warn(
                    s"$name: ${ev.oversizedBuckets} oversized group(s), " +
                      s"largest ${ev.maxBucketSize} members$declined. " +
                      remedy + " Further '" + family + "' skew events " +
                      "this session log at DEBUG with a suppressed count.")
                } else {
                  val n = prior.incrementAndGet()
                  log.debug(
                    s"$name: ${ev.oversizedBuckets} oversized group(s), largest " +
                      s"${ev.maxBucketSize}, declining ${ev.skippedPairs} pair(s) " +
                      s"($n '$family' WARN(s) suppressed this session)")
                }
              }
            }
          }
        override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
      })
    }
}
