package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class UnigramLMSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed unigram surprisals; empty doc scores 0") {
    // counts: a=3, b=2, c=1; total 6
    val docs = Seq((1L, "a a b"), (2L, "a c b"), (3L, "")).toDF("doc_id", "text")
    val out = UnigramLM.unigramScores(docs, "doc_id", "text", topV = 10)
      .orderBy("doc_id").collect()
    val pa = 3.0 / 6.0; val pb = 2.0 / 6.0; val pc = 1.0 / 6.0
    val exp1 = (-math.log(pa) * 2 - math.log(pb)) / 3
    val exp2 = (-math.log(pa) - math.log(pc) - math.log(pb)) / 3
    assert(out(0).getInt(1) === 3)
    assert(math.abs(out(0).getDouble(2) - exp1) < 1e-6)
    assert(math.abs(out(1).getDouble(2) - exp2) < 1e-6)
    assert(out(2).getInt(1) === 0 && out(2).getDouble(2) === 0.0)
  }

  test("vocab cap: OOV tokens take the 1/total floor, not their true count") {
    // counts: a=3, b=2; total 5. topV=1 keeps only 'a'; b is OOV with
    // floor p=1/5 even though its true count is 2.
    val docs = Seq((1L, "a a a"), (2L, "b b")).toDF("doc_id", "text")
    val out = UnigramLM.unigramScores(docs, "doc_id", "text", topV = 1)
      .orderBy("doc_id").collect()
    assert(math.abs(out(0).getDouble(2) - (-math.log(3.0 / 5.0))) < 1e-6)
    assert(math.abs(out(1).getDouble(2) - (-math.log(1.0 / 5.0))) < 1e-6)
    // and the capped vocabulary is exactly the top-1 token
    val v = UnigramLM.vocabulary(docs, "text", 1).as[(String, Long)].collect()
    assert(v.toSeq === Seq(("a", 3L)))
  }

  test("prose scores lower (more probable) than rare-token soup") {
    val docs = Seq(
      (1L, "the the the and and of"),
      (2L, "zqx wvu jkl mno pqr stu"),
    ).toDF("doc_id", "text")
    val out = UnigramLM.unigramScores(docs, "doc_id", "text", topV = 3)
      .orderBy("doc_id").select("mean_neg_logprob").as[Double].collect()
    assert(out(0) < out(1))
  }
}
