package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Ad-hoc single-query profiler (not part of the driver contract):
  * executes named queries with the noop sink (after one untimed
  * warm-up pass) and prints the FINAL adaptive plan with each
  * operator's SQL metrics (output rows, per-operator timings, shuffle
  * bytes, spill) — the Spark-UI SQL tab as text, for hosts where the
  * UI is disabled.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.QProf <query> [query...]
  */
object QProf {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: QProf <query> [query ...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Defaults.sessionBuilder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (n <- args) {
      // warm-up (JIT + caches), then the measured run
      SparkEntry.queries(n)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      spark.catalog.clearCache()
      val df = SparkEntry.queries(n)(spark, sfDir)
      // Capture the QueryExecution that actually RAN (the write
      // command's own), with its post-run AQE final plan and filled
      // SQL metrics — df.queryExecution re-plans lazily and would
      // show a post-cache-release tree instead.
      val captured = new java.util.concurrent.atomic.AtomicReference[
        org.apache.spark.sql.execution.QueryExecution]()
      val listener = new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(fn: String,
            qe: org.apache.spark.sql.execution.QueryExecution, ns: Long): Unit = {
          val cur = captured.get()
          if (cur == null || qe.executedPlan.toString.length >
              cur.executedPlan.toString.length) captured.set(qe)
        }
        override def onFailure(fn: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            e: Exception): Unit = ()
      }
      spark.listenerManager.register(listener)
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      val sec = (System.nanoTime() - t0) / 1e9
      // the listener bus is async — give onSuccess a moment to land
      var waited = 0
      while (captured.get() == null && waited < 50) { Thread.sleep(100); waited += 1 }
      spark.listenerManager.unregister(listener)
      println(f"== $n%s: $sec%.3f s (warm, noop) ==")
      def unwrap(p: SparkPlan): SparkPlan = p match {
        case a: AdaptiveSparkPlanExec => unwrap(a.executedPlan)
        case q if q.getClass.getName.contains("QueryStage") =>
          unwrap(q.getClass.getMethod("plan").invoke(q).asInstanceOf[SparkPlan])
        case other => other
      }
      def show(p: SparkPlan, depth: Int): Unit = {
        val finalP = unwrap(p)
        val ms = finalP.metrics.toSeq
          .filter { case (_, m) => m.value > 0 }
          .sortBy(_._1)
          .map { case (k, m) => s"$k=${m.value}" }
          .mkString(", ")
        println("  " * depth + finalP.nodeName + (if (ms.nonEmpty) s"  [$ms]" else ""))
        finalP.children.foreach(show(_, depth + 1))
        finalP.subqueries.foreach(show(_, depth + 1))
      }
      val qe = captured.get()
      show(if (qe != null) qe.executedPlan else df.queryExecution.executedPlan, 0)
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
