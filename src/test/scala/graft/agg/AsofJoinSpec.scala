package graft.agg

import org.apache.spark.sql.Row

import graft.SparkSpec

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def left = Seq(
    ("u1", 10L, "L1"),
    ("u1", 20L, "L2"),
    ("u2", 5L, "L3"),
  ).toDF("k", "t", "lval")

  private def right = Seq(
    ("u1", 10L, "a"),
    ("u1", 15L, "b"),
    ("u2", 50L, "c"),
  ).toDF("k", "rt", "rval")

  test("inclusive: latest right row with rt <= t; unmatched left keeps nulls") {
    val out = AsofJoin.asofJoinLast(left, right, Seq("k"), "t", "rt", Seq("rval"))
      .orderBy("k", "t").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getString(3))).toSeq
      === Seq(
        ("u1", 10L, "L1", "a"), // equal timestamp matches (inclusive)
        ("u1", 20L, "L2", "b"), // latest of {a@10, b@15}
        ("u2", 5L, "L3", null), // only right row is in the future
      ))
  }

  test("strict: equal timestamps do not match") {
    val out = AsofJoin.asofJoinLastStrict(left, right, Seq("k"), "t", "rt", Seq("rval"))
      .orderBy("k", "t").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getString(3))).toSeq
      === Seq(("u1", 10L, null), ("u1", 20L, "b"), ("u2", 5L, null)))
  }

  test("multiple carried right columns stay row-consistent") {
    val r2 = Seq(("u1", 8L, "x", 1.0), ("u1", 15L, "y", 2.0)).toDF("k", "rt", "rid", "rv")
    val out = AsofJoin.asofJoinLast(left, r2, Seq("k"), "t", "rt", Seq("rid", "rv"))
      .orderBy("k", "t").collect()
    // L1@10 -> (x, 1.0); L2@20 -> (y, 2.0): both columns from the SAME
    // matched row, never mixed across rows
    assert(out(0).getString(3) === "x" && out(0).getDouble(4) === 1.0)
    assert(out(1).getString(3) === "y" && out(1).getDouble(4) === 2.0)
  }

  test("left rows never match right rows of another key") {
    val out = AsofJoin.asofJoinLast(left, right, Seq("k"), "t", "rt", Seq("rval"))
    val u2 = out.filter($"k" === "u2").select("rval").collect()
    assert(u2.toSeq === Seq(Row(null)))
  }

  test("a null attribute in the matched row is NOT papered over by an older row") {
    // matched row (t=10) has rid=x but rv=null; an earlier row (t=5)
    // has rv=2.0 — a per-column fill would stitch (x, 2.0); the
    // correct ASOF result is (x, null), all from the t=10 row
    val r = Seq(
      ("u1", 5L, Some("w"), Some(2.0)),
      ("u1", 10L, Some("x"), None),
    ).toDF("k", "rt", "rid", "rv")
    val l = Seq(("u1", 20L)).toDF("k", "t")
    val out = AsofJoin.asofJoinLast(l, r, Seq("k"), "t", "rt", Seq("rid", "rv")).collect()
    assert(out.length === 1)
    assert(out(0).getString(2) === "x")
    assert(out(0).isNullAt(3), s"expected null rv from the matched row, got ${out(0).get(3)}")
  }

  test("null keys never match (standard join semantics)") {
    val l = Seq((Option.empty[String], 20L)).toDF("k", "t")
    val r = Seq((Option.empty[String], 10L, "a"), (Some("u1"), 10L, "b")).toDF("k", "rt", "rval")
    val out = AsofJoin.asofJoinLast(l, r, Seq("k"), "t", "rt", Seq("rval")).collect()
    assert(out.length === 1 && out(0).isNullAt(2),
      "a null-key left row must not carry a null-key right row")
  }
}
