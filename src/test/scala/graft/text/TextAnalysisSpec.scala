package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("tokens: whitespace split, blank → empty array") {
    val out = Seq("a b  c", "  ", "", "one").toDF("t")
      .select(TextAnalysis.tokenCount(col("t")).as("n")).as[Int].collect().toSeq
    assert(out == Seq(3, 0, 0, 1))
  }

  test("bpe-ish tokens: words and punctuation split") {
    val n = Seq("don't stop, world!").toDF("t")
      .select(TextAnalysis.bpeishTokenCount(col("t"))).as[Int].head()
    // don ' t stop , world !
    assert(n == 7)
  }

  test("langId picks dominant stopword language; no hits → und") {
    val cases = Seq(
      "the cat and the dog is in that house" -> "en",
      "der Hund und die Katze ist nicht ein Tier" -> "de",
      "le chat et la maison est dans une rue" -> "fr",
      "el perro es una mascota para los vecinos" -> "es",
      "qwerty zxcvb asdfgh" -> "und",
    )
    val out = cases.map(_._1).toDF("t")
      .select(TextAnalysis.langId(col("t"))).as[String].collect().toSeq
    assert(out == cases.map(_._2))
  }

  test("fingerprint: whitespace/case variants share md5; rolling hash is order-sensitive") {
    val fp = Seq("Hello  World", "hello world", "world hello").toDF("t")
      .select(TextAnalysis.fingerprintMd5(col("t"))).as[String].collect().toSeq
    assert(fp(0) == fp(1))
    assert(fp(0) != fp(2))
    val rh = Seq("hello world", "world hello").toDF("t")
      .select(TextAnalysis.rollingHash64(col("t"))).as[Long].collect().toSeq
    assert(rh(0) != rh(1))
  }

  test("quality score bounded in [0,1]; longer clean text scores higher than punct soup") {
    val clean = "the quick brown fox jumps over the lazy dog and runs through the field with great speed today"
    val soup = "!!! ??? ### $$$ %%%"
    val out = Seq(clean, soup).toDF("t")
      .select(TextAnalysis.qualityScore(col("t"))).as[Double].collect().toSeq
    assert(out.forall(s => s >= 0.0 && s <= 1.0))
    assert(out(0) > out(1))
  }

  test("repetitionScore: duplicate 2-gram fraction; degenerate docs → 0") {
    val docs = Seq(
      "a b a b a b",         // grams: ab,ba,ab,ba,ab → 2 distinct of 5 → 0.6
      "all distinct words here", // 3 grams, all distinct → 0.0
      "word",                // < 2 tokens → 0
      "",                    // empty → 0
      "spam spam spam spam", // 3 grams, 1 distinct → 2/3
    ).toDF("t")
      .withColumn("_toks", TextAnalysis.tokens(TextAnalysis.normalized(col("t"))))
    val out = docs.select(TextAnalysis.repetitionScore(col("_toks"), 2).as("r"))
      .as[Double].collect().toSeq
    assert(out(0) == 0.6)
    assert(out(1) == 0.0)
    assert(out(2) == 0.0)
    assert(out(3) == 0.0)
    assert(math.abs(out(4) - 0.666667) < 1e-6)
  }

  test("meanWordLength") {
    val m = Seq("ab abcd").toDF("t")
      .select(TextAnalysis.meanWordLength(col("t"))).as[Double].head()
    assert(m == 3.0)
  }

  test("gopher helpers: symbol ratio, alpha fraction, mean word length on bound tokens") {
    val df = Seq(
      "the cat sat on the mat",    // clean: no symbols, all alpha
      "# # # price ...",           // 3 '#' + 1 '...' over 5 words
      "123 456 789 word",          // 1 of 4 words alphabetic
      "",                          // empty: ratio conventions
      "wait… what…",               // 2 single-char ellipses over 2 words
    ).toDF("t").withColumn("_toks", TextAnalysis.tokens(col("t")))
    val out = df.select(
      TextAnalysis.symbolWordRatio(col("t"), col("_toks")).as("sym"),
      TextAnalysis.alphaWordFraction(col("_toks")).as("alpha"),
      TextAnalysis.meanWordLengthOf(col("_toks")).as("mwl"),
    ).collect()
    assert(out(0).getDouble(0) == 0.0 && out(0).getDouble(1) == 1.0)
    assert(out(1).getDouble(0) == 4.0 / 5.0)
    assert(out(2).getDouble(1) == 0.25)
    // empty doc: all-symbol (1.0), no alpha words (0.0), mwl 0
    assert(out(3).getDouble(0) == 1.0 && out(3).getDouble(1) == 0.0
      && out(3).getDouble(2) == 0.0)
    // the single-char ellipsis counts as a symbol too
    assert(out(4).getDouble(0) == 1.0)
    // bound-tokens mean word length agrees with the text form
    val both = Seq("ab abcd").toDF("t")
      .withColumn("_toks", TextAnalysis.tokens(col("t")))
      .select(TextAnalysis.meanWordLengthOf(col("_toks"))).as[Double].head()
    assert(both == 3.0)
  }

  test("law: graft_token_tf ≡ explode(graft_tokens) → groupBy count, on the real corpus") {
    // the map-side kernel that replaced the (doc, token) exchange in
    // the BM25/classifier indexing paths must count exactly what the
    // shuffle counted
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val viaKernel = docs
      .select(col("doc_id"),
        explode(call_function("graft_token_tf", col("text"))).as("_e"))
      .select(col("doc_id"), col("_e.t").as("token"), col("_e.tf").as("tf"))
      .as[(Long, String, Long)].collect().toSet
    val viaShuffle = docs
      .select(col("doc_id"),
        explode(TextAnalysis.normalizedTokens(col("text"))).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
      .as[(Long, String, Long)].collect().toSet
    assert(viaKernel == viaShuffle)
    assert(viaKernel.nonEmpty)
    // null and empty text: null yields NULL (explode drops), empty
    // yields an empty array
    val edge = Seq((1L, null: String), (2L, ""), (3L, "a a b"))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        explode(call_function("graft_token_tf", col("text"))).as("_e"))
      .select(col("doc_id"), col("_e.t"), col("_e.tf"))
      .as[(Long, String, Long)].collect().toSet
    assert(edge == Set((3L, "a", 2L), (3L, "b", 1L)))
  }
}
