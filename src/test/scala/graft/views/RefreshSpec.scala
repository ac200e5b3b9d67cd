package graft.views

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

class RefreshSpec extends SparkSpec {
  import spark.implicits._

  test("refreshView atomically swaps; readers see old or new, never partial") {
    val wh = Files.createTempDirectory("graft-views").toString
    val job1 = Refresh.ViewJob("mv_test", s => {
      import s.implicits._
      Seq((1, "a")).toDF("k", "v")
    })
    assert(Refresh.refreshView(spark, wh, job1) == 1)
    assert(spark.read.parquet(Refresh.viewPath(wh, "mv_test")).count() == 1)
    val job2 = Refresh.ViewJob("mv_test", s => {
      import s.implicits._
      Seq((1, "a"), (2, "b")).toDF("k", "v")
    })
    assert(Refresh.refreshView(spark, wh, job2) == 2)
    assert(spark.read.parquet(Refresh.viewPath(wh, "mv_test"))
      .orderBy("k").select("v").as[String].collect().toSeq == Seq("a", "b"))
  }

  test("registry refreshes only views of loaded sources, deduplicated") {
    val wh = Files.createTempDirectory("graft-views2").toString
    var builds = 0
    val shared = Refresh.ViewJob("mv_shared", s => { builds += 1; import s.implicits._; Seq(1).toDF("x") })
    val reg = Refresh.Registry(Map(
      "entsoe" -> Seq(shared),
      "ons" -> Seq(shared),
      "eia" -> Seq.empty,
    ))
    val res = Refresh.refreshForSources(spark, wh, reg, Seq("entsoe", "ons", "eia"))
    assert(res == Map("mv_shared" -> 1L))
    assert(builds == 1)
  }
}
