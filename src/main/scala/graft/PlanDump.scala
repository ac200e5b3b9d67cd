package graft

/** Ad-hoc plan-dump main (not part of the driver contract): writes
  * each named query's `.explain("formatted")` output to
  * `<outDir>/<query>_<tag>.txt`, so optimization rounds can commit
  * before/after physical plans (Exchange count, join strategy,
  * PushedFilters/ReadSchema) for queries they touch.
  *
  * Usage: runMain graft.PlanDump <outDir> <tag> [query ...]
  * (no query names = every declared query). Data dir from
  * SPARK_GRAFT_SF_DIR like the bench.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <outDir> <tag> [query ...]")
    val outDir = args(0)
    val tag = args(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names =
      if (args.length > 2) args.drop(2).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: $unknown")
    val spark = Defaults.sessionBuilder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val mode = org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    for (n <- names) {
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        val txt = df.queryExecution.explainString(mode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(outDir, s"${n}_$tag.txt"),
          txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        println(s"[plandump] wrote $n ($tag)")
      } catch {
        case e: Throwable =>
          println(s"[plandump] $n FAILED: ${e.getMessage.take(160)}")
      }
    }
    spark.stop()
  }
}
