package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc local profiling main (not part of the driver contract):
  * times individual SparkEntry queries sequentially. */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val cpus = Defaults.cpus
    val spark = Defaults.sessionBuilder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val explain = sys.env.contains("PROBE_EXPLAIN")
    // PROBE_DUMP=<dir>: also write each probed query's result as
    // parquet (Verify's layout), so a single query can be checked
    // against its DuckDB oracle without a full Verify pass.
    val dump = sys.env.get("PROBE_DUMP")
    for (n <- names) {
      val t0 = System.nanoTime()
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        if (explain) println(df.queryExecution.executedPlan.toString.take(24000))
        dump.foreach { d =>
          df.repartition(1).write.mode("overwrite").parquet(s"$d/$n")
        }
        val cnt = df.count()
        println(f"[probe] $n%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs rows=$cnt")
      } catch {
        case e: Throwable =>
          println(f"[probe] $n%-28s FAILED ${e.getMessage.take(120)}")
      }
    }
    spark.stop()
  }
}
