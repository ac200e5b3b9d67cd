package graft.text

import graft.SparkSpec

class BigramLMSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed Laplace bigram surprisals; short docs score 0") {
    // doc 1 bigrams: (a,b), (b,a), (a,b); doc 2: (b,a)
    // corpus: c(a,b)=2, c(b,a)=2; c1(a)=2, c1(b)=2; vocab {a,b,x}
    // (doc 3's lone 'x' has no bigrams but still counts as a unigram
    // type under topV=10), so V = 4 incl. <unk>
    val docs = Seq((1L, "a b a b"), (2L, "b a"), (3L, "x"), (4L, ""))
      .toDF("doc_id", "text")
    val out = BigramLM.bigramScores(docs, "doc_id", "text", topV = 10)
      .orderBy("doc_id").collect()
    val pab = 3.0 / 6.0 // (2+1)/(2+4)
    val pba = 3.0 / 6.0
    val exp1 = (-math.log(pab) * 2 - math.log(pba)) / 3
    assert(out(0).getInt(1) === 3)
    assert(math.abs(out(0).getDouble(2) - exp1) < 1e-6)
    assert(out(1).getInt(1) === 1)
    assert(math.abs(out(1).getDouble(2) - -math.log(pba)) < 1e-6)
    // single-token and empty docs: no bigrams, score 0
    assert(out(2).getInt(1) === 0 && out(2).getDouble(2) === 0.0)
    assert(out(3).getInt(1) === 0 && out(3).getDouble(2) === 0.0)
  }

  test("vocab cap folds OOV tokens into one <unk> state") {
    // topV=1 keeps only 'a' (count 4); b and c both become <unk>, so
    // (a,b) and (a,c) are the SAME model bigram (a,<unk>): c=2,
    // c1(a)=2, V=2 -> p = (2+1)/(2+2) for both docs.
    val docs = Seq((1L, "a b a c"), (2L, "a a")).toDF("doc_id", "text")
    val out = BigramLM.bigramScores(docs, "doc_id", "text", topV = 1)
      .orderBy("doc_id").collect()
    // doc 1 bigrams after mapping: (a,u),(u,a),(a,u) with c(a,u)=2... recompute:
    // stream doc1: (a,u),(u,a),(a,u); doc2: (a,a)
    // c(a,u)=2, c(u,a)=1, c(a,a)=1; c1(a)=3, c1(u)=1; V=2
    val pau = (2.0 + 1) / (3 + 2)
    val pua = (1.0 + 1) / (1 + 2)
    val paa = (1.0 + 1) / (3 + 2)
    val exp1 = (-math.log(pau) * 2 - math.log(pua)) / 3
    assert(math.abs(out(0).getDouble(2) - exp1) < 1e-6)
    assert(math.abs(out(1).getDouble(2) - -math.log(paa)) < 1e-6)
  }

  test("shuffled text scores higher than the prose it was shuffled from") {
    // 'the cat sat on the mat' repeated = high-probability transitions;
    // a derangement of the same tokens breaks them: same unigram
    // profile, higher bigram surprisal.
    val prose = Array.fill(8)("the cat sat on the mat").mkString(" ")
    val shuffled = ("mat the on cat the sat " * 8).trim
    val docs = Seq((1L, prose), (2L, shuffled)).toDF("doc_id", "text")
    val out = BigramLM.bigramScores(docs, "doc_id", "text", topV = 10)
      .orderBy("doc_id").collect()
    assert(out(0).getDouble(2) < out(1).getDouble(2))
  }
}
