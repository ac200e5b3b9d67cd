package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Action-level decomposition of the i8 metadata-load path — the
  * committed breakdown behind the ARCHITECTURE floor adjudication for
  * the small-batch append family (load → upsert → metadata record →
  * read-back).
  *
  * A small load's wall time is dominated by per-ACTION launch cost,
  * not data: every Dataset action (a count, an agg head(), a parquet
  * write) pays scheduler + codegen-cache + task-launch overhead that
  * no fusion below one-action-per-obligation can remove. This probe
  * runs the i8 query closure warm, records every query execution the
  * session completes (name, wall seconds, one-line plan head) via a
  * QueryExecutionListener, and prints the per-run action list plus
  * the residual (total − Σ actions = driver logic, FS metadata ops,
  * the writer lease's create/read/delete round-trips).
  *
  * Usage: tools/runmain.sh graft.AppendPathProbe [reps]
  */
object AppendPathProbe {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(5)
    val cpus = Defaults.cpus
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val actions = new java.util.concurrent.ConcurrentLinkedQueue[(String, Double)]()
    spark.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
        val head = qe.executedPlan.nodeName
        actions.add((s"$funcName/$head", durationNs / 1e9)); ()
      }
      override def onFailure(funcName: String, qe: QueryExecution, e: Exception): Unit = ()
    })

    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    def runOnce(): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries("i8_metadata_row")(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    // warm: JIT + codegen + parquet-footer caches
    runOnce(); runOnce()
    // listener events arrive async — settle before clearing
    Thread.sleep(1000)
    actions.clear()

    var best = Double.MaxValue
    var bestActions: Seq[(String, Double)] = Seq.empty
    // Drain the async listener bus by QUIESCENCE, not a fixed sleep: a
    // loaded host can lag event delivery past any constant, which
    // would truncate one rep's action list and pollute the next —
    // wait until no new event arrives for 500 ms (max 10 s), then
    // read. A run still delivering after 10 s fails loudly below via
    // the action-count sanity check rather than skewing the artifact.
    def drainQuiesce(): Unit = {
      val deadline = System.nanoTime() + 10L * 1000000000L
      var last = -1
      while (last != actions.size() && System.nanoTime() < deadline) {
        last = actions.size()
        Thread.sleep(500)
      }
    }
    var expectActions = -1
    for (_ <- 0 until reps) {
      actions.clear()
      val total = runOnce()
      drainQuiesce()
      val acts = {
        val it = actions.iterator(); val b = Seq.newBuilder[(String, Double)]
        while (it.hasNext) b += it.next(); b.result()
      }
      // per-run action counts must agree: a mismatch means an event
      // leaked across reps and the breakdown cannot be trusted
      if (expectActions < 0) expectActions = acts.size
      require(acts.size == expectActions,
        s"listener drained ${acts.size} actions vs $expectActions in an earlier rep; " +
          "event delivery leaked across reps - rerun on a quieter host")
      if (total < best) { best = total; bestActions = acts }
      System.err.println(f"[appendpath] run total $total%.3f s, ${acts.size} actions, " +
        f"sum ${acts.map(_._2).sum}%.3f s")
    }
    def f3(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val actJson = bestActions
      .map { case (n, s) => s"""{"action":"$n","sec":${f3(s)}}""" }
      .mkString("[", ",", "]")
    val line =
      s"""{"metric":"i8_action_breakdown","best_total_sec":${f3(best)},""" +
        s""""n_actions":${bestActions.size},""" +
        s""""actions_sum_sec":${f3(bestActions.map(_._2).sum)},""" +
        s""""residual_sec":${f3(best - bestActions.map(_._2).sum)},""" +
        s""""actions":$actJson,"reps":$reps}"""
    println(line)
    sys.env.get("SPARK_GRAFT_APPENDPATH_OUT").foreach { p =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(p),
        (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    spark.stop()
  }
}
