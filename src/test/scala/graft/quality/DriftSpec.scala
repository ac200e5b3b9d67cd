package graft.quality

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DriftSpec extends SparkSpec {
  import spark.implicits._

  test("missingFromCrosswalk: distinct unmatched keys, nulls pre-filtered on both sides") {
    val raw = Seq(Some("P1"), Some("P1"), Some("P2"), Some("P3"), None).toDF("plant")
    val cw = Seq(("sysA", Some("P1")), ("sysA", None), ("sysB", Some("P2"))).toDF("source_system", "plant")
    val out = Drift.missingFromCrosswalk(raw, col("plant"), cw, col("plant"),
      col("source_system") === "sysA")
    // P2 only matches under sysB → missing for sysA; null raw key dropped
    assert(out.as[String].collect().toSeq == Seq("P2", "P3"))
  }

  test("qualityFloor gate") {
    val df = (1 to 250).map(i => ("coal", i)).toDF("fuel", "i")
    assert(Drift.qualityFloor(df, col("fuel") === "coal", 200))
    assert(!Drift.qualityFloor(df, col("fuel") === "gas", 1))
  }
}
