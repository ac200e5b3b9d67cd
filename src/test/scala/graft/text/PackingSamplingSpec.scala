package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PackingSamplingSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "s1", 800L), (2L, "s1", 800L), (3L, "s1", 800L), (4L, "s1", 100L),
    (10L, "s2", 2500L), (11L, "s2", 10L),
  ).toDF("doc_id", "source", "toks")

  test("packByBudget: contiguous fill, pack advances when the budget is crossed") {
    val out = Packing.packByBudget(docs, "doc_id", col("toks"), Seq("source"), 2000L)
      .select("doc_id", "pack_no", "pack_cum_tokens").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    // s1: cum 800,1600,2400,2500 → exclusive starts 0,800,1600,2400 → packs 0,0,0,1
    assert(out(1L) == ((0, 800L)) && out(2L) == ((0, 1600L)))
    assert(out(3L) == ((0, 2400L))) // straddler stays in the pack it started
    assert(out(4L) == ((1, 2500L)))
    // s2: an oversized doc owns pack 0; the next doc starts pack 1
    assert(out(10L) == ((0, 2500L)) && out(11L) == ((1, 2510L)))
  }

  test("packByBudget: pack_no is nondecreasing in id order within each group") {
    val out = Packing.packByBudget(docs, "doc_id", col("toks"), Seq("source"), 1000L)
    val bySource = out.select("source", "doc_id", "pack_no").collect()
      .groupBy(_.getString(0)).view.mapValues(_.sortBy(_.getLong(1)).map(_.getInt(2)).toSeq)
    bySource.foreach { case (src, packs) =>
      assert(packs == packs.sorted, s"source=$src packs=$packs")
    }
  }

  test("hexThreshold endpoints and ordering") {
    assert(Sampling.hexThreshold(0.0) == "0" * 32)
    assert(Sampling.hexThreshold(1.0) == "g") // above every hex md5
    assert(Sampling.hexThreshold(0.25) == "4" + "0" * 31)
    assert(Sampling.hexThreshold(0.1) < Sampling.hexThreshold(0.5))
  }

  test("deterministicSample: endpoints, determinism, monotone nesting") {
    val ids = (1L to 400L).toDF("doc_id")
    assert(Sampling.deterministicSample(ids, col("doc_id"), 1.0).count() == 400)
    assert(Sampling.deterministicSample(ids, col("doc_id"), 0.0).count() == 0)
    val half = Sampling.deterministicSample(ids, col("doc_id"), 0.5)
      .as[Long].collect().toSet
    assert(Sampling.deterministicSample(ids, col("doc_id"), 0.5)
      .as[Long].collect().toSet == half) // pure function of the key
    val quarter = Sampling.deterministicSample(ids, col("doc_id"), 0.25)
      .as[Long].collect().toSet
    assert(quarter.subsetOf(half)) // nested thresholds → nested samples
    assert(math.abs(half.size - 200) < 60) // ~Binomial(400, .5)
    // a different salt draws a different (deterministic) sample
    val salted = Sampling.deterministicSample(ids, col("doc_id"), 0.5, salt = "s")
      .as[Long].collect().toSet
    assert(salted != half)
  }

  test("stratifiedSample: per-stratum fractions, default for unlisted strata") {
    val rows = (1L to 300L).map(i => (i, if (i % 3 == 0) "en" else if (i % 3 == 1) "de" else "xx"))
      .toDF("doc_id", "lang")
    val kept = Sampling.stratifiedSample(rows, col("doc_id"), col("lang"),
      Map("en" -> 1.0, "de" -> 0.5), defaultFraction = 0.0)
    val byLang = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("en") == 100) // fraction 1.0 keeps the whole stratum
    assert(byLang.getOrElse("xx", 0L) == 0) // default 0 drops unlisted
    assert(byLang("de") > 20 && byLang("de") < 80)
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("tokenBudgetSample: exact md5-order prefix cut, straddler kept, zero budget drops") {
    val kept = Sampling
      .tokenBudgetSample(docs, col("doc_id"), col("source"), col("toks"),
        Map("s1" -> 1000L), defaultBudget = 0L, salt = "t")
      .select("doc_id").as[Long].collect().toSet
    // replicate the cut by hand: s1 docs in md5("t:id") order, keep
    // while the exclusive running sum is under budget
    val toks = Map(1L -> 800L, 2L -> 800L, 3L -> 800L, 4L -> 100L)
    val ordered = Seq(1L, 2L, 3L, 4L).sortBy(id => md5hex(s"t:$id"))
    var cum = 0L
    val expected = ordered.flatMap { id =>
      val keep = cum < 1000L; cum += toks(id); if (keep) Some(id) else None
    }.toSet
    assert(kept == expected)
    assert(cum > 1000L && kept.size < 4) // the budget genuinely cut the stratum
    // s2 (budget 0) contributes nothing — not even a straddler
    assert(kept.intersect(Set(10L, 11L)).isEmpty)
  }

  test("tokenBudgetSample: full budget keeps all, budgets nest, min one doc per funded stratum") {
    val all = Sampling.tokenBudgetSample(docs, col("doc_id"), col("source"), col("toks"),
      Map("s1" -> 1000000L, "s2" -> 1000000L))
    assert(all.count() == docs.count())
    val small = Sampling.tokenBudgetSample(docs, col("doc_id"), col("source"), col("toks"),
      Map("s1" -> 500L, "s2" -> 500L)).select("doc_id").as[Long].collect().toSet
    val large = Sampling.tokenBudgetSample(docs, col("doc_id"), col("source"), col("toks"),
      Map("s1" -> 1500L, "s2" -> 1500L)).select("doc_id").as[Long].collect().toSet
    assert(small.subsetOf(large)) // same order → prefix nesting
    // budget 1: exactly the first-hash doc of each stratum survives
    val one = Sampling.tokenBudgetSample(docs, col("doc_id"), col("source"), col("toks"),
      Map("s1" -> 1L, "s2" -> 1L)).select("source").as[String].collect().toSeq.sorted
    assert(one == Seq("s1", "s2"))
  }

  test("tokenBudgetSample: negative weights clamp to zero — the cut stays a hash-order prefix") {
    // A bad upstream token count must not make the running prior
    // non-monotone: without the clamp, a doc AFTER the budget boundary
    // can slip back under it. The law: negative weights behave exactly
    // as if they were zero.
    val noisy = (1L to 40L)
      .map(i => (i, "s", if (i % 3 == 0) -1000L else 50L))
      .toDF("doc_id", "source", "toks")
    val clamped = noisy.withColumn("toks", greatest(col("toks"), lit(0L)))
    def cut(df: org.apache.spark.sql.DataFrame): Set[Long] = Sampling
      .tokenBudgetSample(df, col("doc_id"), col("source"), col("toks"),
        Map("s" -> 300L), salt = "neg")
      .select("doc_id").as[Long].collect().toSet
    assert(cut(noisy) == cut(clamped))
    // and the boundary genuinely engaged (not a vacuous equality)
    assert(cut(noisy).size < 40)
  }

  test("weightedSample: endpoints, hand-computed 60-bit boundary, monotone in p") {
    val rows = (1L to 300L).map(i => (i, i / 300.0)).toDF("doc_id", "p")
    // p=1 keeps everything, p=0 keeps nothing
    assert(Sampling.weightedSample(rows, col("doc_id"), lit(1.0)).count() == 300)
    assert(Sampling.weightedSample(rows, col("doc_id"), lit(0.0)).count() == 0)
    // out-of-range probabilities clamp instead of misbehaving
    assert(Sampling.weightedSample(rows, col("doc_id"), lit(7.5)).count() == 300)
    assert(Sampling.weightedSample(rows, col("doc_id"), lit(-3.0)).count() == 0)
    // exact per-row boundary: draw = first 15 md5 hex digits < floor(p·2^60)
    val kept = Sampling.weightedSample(rows, col("doc_id"), col("p"), salt = "w")
      .select("doc_id").as[Long].collect().toSet
    val expected = (1L to 300L).filter { id =>
      val draw = java.lang.Long.parseLong(md5hex(s"w:$id").take(15), 16)
      draw < math.floor((id / 300.0) * math.pow(2, 60)).toLong
    }.toSet
    assert(kept == expected)
    assert(kept.nonEmpty && kept.size < 300)
    // a per-row probability is monotone: doubling p never drops a kept doc
    val doubled = Sampling.weightedSample(rows, col("doc_id"),
      least(lit(1.0), col("p") * 2), salt = "w").select("doc_id").as[Long].collect().toSet
    assert(kept.subsetOf(doubled))
  }

  test("topFractionByScore: per-stratum percentile cut, singleton survives, endpoints") {
    val rows = Seq(
      ("a", 1L, 0.9), ("a", 2L, 0.8), ("a", 3L, 0.7), ("a", 4L, 0.6), ("a", 5L, 0.5),
      ("b", 10L, 0.1), // singleton stratum: percent_rank 0 → always kept
    ).toDF("lang", "doc_id", "score")
    def kept(f: Double) = Sampling
      .topFractionByScore(rows, col("lang"), col("score"), col("doc_id"), f)
      .select("doc_id").as[Long].collect().toSet
    // a: percent_ranks 0, .25, .5, .75, 1 → f=0.5 keeps 1,2,3; b's single row always
    assert(kept(0.5) == Set(1L, 2L, 3L, 10L))
    assert(kept(0.0) == Set(1L, 10L)) // only each stratum's best
    assert(kept(1.0) == Set(1L, 2L, 3L, 4L, 5L, 10L))
    // deterministic tiebreak: equal scores cut by key order
    val tied = Seq(("a", 1L, 0.5), ("a", 2L, 0.5), ("a", 3L, 0.5)).toDF("lang", "doc_id", "score")
    val cut = Sampling.topFractionByScore(tied, col("lang"), col("score"), col("doc_id"), 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(cut == Set(1L, 2L)) // ranks 0, .5, 1
  }

  test("shardOrder: hand-computed shard + pos, dense 1-based positions, salt reshuffles") {
    val ids = (1L to 200L).toDF("doc_id")
    val out = TrainOrder.shardOrder(ids, col("doc_id"), numShards = 4, salt = "e")
      .select("doc_id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    // replicate by hand: shard = first 8 md5 hex digits mod 4, pos =
    // rank within shard by (hash, id)
    def hk(id: Long) = md5hex(s"e:$id")
    val expected = (1L to 200L)
      .map(id => (id, (java.lang.Long.parseLong(hk(id).take(8), 16) % 4).toInt))
      .groupBy(_._2)
      .flatMap { case (shard, members) =>
        members.sortBy { case (id, _) => (hk(id), id) }.zipWithIndex
          .map { case ((id, _), i) => (id, shard, i + 1) }
      }.toSet
    assert(out.toSet == expected)
    // every row landed in [0, 4) and each shard's positions are dense 1..n
    out.groupBy(_._2).foreach { case (shard, rows) =>
      assert(shard >= 0 && shard < 4)
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.length))
    }
    // a different salt permutes: some doc changes shard or position
    val other = TrainOrder.shardOrder(ids, col("doc_id"), 4, salt = "f")
      .select("doc_id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(other != out.toSet)
  }

  test("assignSplit: exhaustive, deterministic, and band-consistent with the samplers") {
    val many = (1L to 2000L).map(i => (i, if (i % 4 == 0) "fr" else "en"))
      .toDF("doc_id", "lang")
    val split = Sampling.assignSplit(many, col("doc_id"), col("lang"),
      valFraction = 0.1, testFraction = 0.1, salt = "s")
    val out = split.select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(out.size == 2000) // exhaustive: every doc gets exactly one label
    // the test band is exactly the deterministic sample at testFraction,
    // and test+val exactly the sample at the summed fraction (nesting)
    val t = Sampling.deterministicSample(many, col("doc_id"), 0.1, salt = "s")
      .select("doc_id").as[Long].collect().toSet
    val tv = Sampling.deterministicSample(many, col("doc_id"), 0.2, salt = "s")
      .select("doc_id").as[Long].collect().toSet
    assert(out.filter(_._2 == "test").keySet == t)
    assert(out.filter(_._2 != "train").keySet == tv)
    // determinism + frozen-eval-set: splitting a subset agrees row-for-row
    val sub = Sampling.assignSplit(many.filter(col("doc_id") <= 500), col("doc_id"),
      col("lang"), 0.1, 0.1, salt = "s")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    sub.foreach { case (id, s) => assert(out(id) == s) }
  }

  test("assignSplit: per-stratum overrides widen holdout only for that stratum") {
    val many = (1L to 4000L).map(i => (i, if (i % 2 == 0) "fr" else "en"))
      .toDF("doc_id", "lang")
    val split = Sampling.assignSplit(many, col("doc_id"), col("lang"),
      valFraction = 0.05, testFraction = 0.05,
      overrides = Map("fr" -> (0.25, 0.25)), salt = "x")
      .select("doc_id", "lang", "split").as[(Long, String, String)].collect()
    val frHoldout = split.count(r => r._2 == "fr" && r._3 != "train") / 2000.0
    val enHoldout = split.count(r => r._2 == "en" && r._3 != "train") / 2000.0
    assert(math.abs(frHoldout - 0.5) < 0.05, s"fr holdout $frHoldout")
    assert(math.abs(enHoldout - 0.1) < 0.05, s"en holdout $enHoldout")
    // fractions out of range refuse loudly
    intercept[IllegalArgumentException] {
      Sampling.assignSplit(many, col("doc_id"), col("lang"), 0.7, 0.4)
    }
  }

  test("rankBuckets: per-stratum terciles, pr=1 in last bucket, deterministic ties") {
    // 6 docs in one stratum with distinct scores → pr = 0, .2, .4, .6,
    // .8, 1.0 → buckets head,head,middle,middle,tail,tail
    val six = (1L to 6L).map(i => (i, "en", i.toDouble)).toDF("doc_id", "lang", "s")
    val got = Sampling.rankBuckets(six, col("lang"), col("s"), col("doc_id"))
      .select("doc_id", "bucket").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "head", 2L -> "head", 3L -> "middle",
      4L -> "middle", 5L -> "tail", 6L -> "tail"))
    // single-doc stratum: pr = 0 (Spark defines 0/0 rank as 0) → head
    val one = Seq((9L, "fr", 5.0)).toDF("doc_id", "lang", "s")
    assert(Sampling.rankBuckets(one, col("lang"), col("s"), col("doc_id"))
      .select("bucket").head().getString(0) == "head")
    // ties break by key: equal scores still bucket deterministically
    val tied = (1L to 6L).map(i => (i, "de", 1.0)).toDF("doc_id", "lang", "s")
    val t = Sampling.rankBuckets(tied, col("lang"), col("s"), col("doc_id"))
      .select("doc_id", "bucket").as[(Long, String)].collect().toMap
    assert(t(1L) == "head" && t(6L) == "tail")
  }

  test("capPerStratum: keeps the best `cap` per stratum; plan pre-prunes via WindowGroupLimit") {
    val d = Seq(
      (1L, "a", 0.9), (2L, "a", 0.8), (3L, "a", 0.7), (4L, "a", 0.6),
      (10L, "b", 0.5),
    ).toDF("doc_id", "source", "q")
    val capped = Sampling.capPerStratum(d, col("source"), col("q"), col("doc_id"), cap = 2)
    val got = capped.select("doc_id").as[Long].collect().toSet
    assert(got == Set(1L, 2L, 10L))
    // the skew defense: the rank filter must rewrite to WindowGroupLimit
    // (map-side top-cap before the shuffle)
    val plan = capped.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(1500))
    // output schema is the input schema (working column dropped)
    assert(capped.columns.toSeq == d.columns.toSeq)
  }

  test("capPerStratumBucketed == capPerStratum row-for-row, both WindowGroupLimit-pruned") {
    // enough rows per stratum that every salt bucket is populated and
    // level-1 caps genuinely evict; score ties broken by doc_id
    val rows = (0 until 500).map(i =>
      (i.toLong, if (i % 5 == 0) "hot" else s"s${i % 7}", (i % 50) / 10.0))
    val d = rows.toDF("doc_id", "source", "q")
    for (cap <- Seq(1, 3, 17); s <- Seq(1, 4, 32)) {
      val plain = Sampling.capPerStratum(d, col("source"), col("q"), col("doc_id"), cap)
        .orderBy("source", "doc_id").collect().toSeq
      val bucketed = Sampling
        .capPerStratumBucketed(d, col("source"), col("q"), col("doc_id"), cap, saltBuckets = s)
        .orderBy("source", "doc_id").collect().toSeq
      assert(bucketed == plain, s"cap=$cap saltBuckets=$s")
    }
    val b = Sampling.capPerStratumBucketed(d, col("source"), col("q"), col("doc_id"), 3)
    assert(b.columns.toSeq == d.columns.toSeq)
    // both window levels must keep the map-side pruning rewrite
    val plan = b.queryExecution.executedPlan.toString
    assert("WindowGroupLimit".r.findAllIn(plan).size >= 2, plan.take(1500))
  }

  test("temperatureShares: hand-computed shares at alpha 0.5/1/0; negatives clamp") {
    val d = Seq((1L, "A", 400L), (2L, "A", 600L), (3L, "B", 100L), (4L, "B", -50L))
      .toDF("doc_id", "stratum", "toks")
    def shares(alpha: Double): Map[String, (Long, Double)] =
      Sampling.temperatureShares(d, col("stratum"), col("toks"), alpha)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // totals: A=1000, B=100 (the -50 clamps to 0)
    val s05 = shares(0.5)
    assert(s05("A")._1 === 1000L && s05("B")._1 === 100L)
    val denom = math.sqrt(1000.0) + math.sqrt(100.0)
    assert(s05("A")._2 === math.rint(math.sqrt(1000.0) / denom * 1e6) / 1e6)
    assert(s05("B")._2 === math.rint(math.sqrt(100.0) / denom * 1e6) / 1e6)
    // alpha=1 is the natural distribution; alpha=0 is uniform
    assert(shares(1.0)("A")._2 === math.rint(1000.0 / 1100.0 * 1e6) / 1e6)
    assert(shares(0.0) === Map("A" -> (1000L, 0.5), "B" -> (100L, 0.5)))
    intercept[IllegalArgumentException] {
      Sampling.temperatureShares(d, col("stratum"), col("toks"), 1.5)
    }
  }

  test("temperatureBudgets: UniMax epoch cap water-fills the freed budget") {
    val d = Seq((1L, "A", 1000L), (2L, "B", 10L)).toDF("doc_id", "stratum", "toks")
    // no cap, alpha=0: uniform halves (floored)
    assert(Sampling.temperatureBudgets(d, col("stratum"), col("toks"),
      alpha = 0.0, totalBudget = 1000L) === Map("A" -> 500L, "B" -> 500L))
    // maxEpochs=2: B caps at 20 tokens; its freed 480 water-fills to A
    assert(Sampling.temperatureBudgets(d, col("stratum"), col("toks"),
      alpha = 0.0, totalBudget = 1000L, maxEpochs = 2.0) ===
      Map("A" -> 980L, "B" -> 20L))
    // caps bind everywhere: leftover budget stays unspent
    assert(Sampling.temperatureBudgets(d, col("stratum"), col("toks"),
      alpha = 1.0, totalBudget = 100000L, maxEpochs = 1.0) ===
      Map("A" -> 1000L, "B" -> 10L))
  }

  test("temperature budgets compose with tokenBudgetSample: per-stratum weight respects the cut") {
    val rows = (0 until 200).map(i =>
      (i.toLong, if (i % 4 == 0) "lo" else "hi", 10L + i % 7))
    val d = rows.toDF("doc_id", "stratum", "toks")
    val budgets = Sampling.temperatureBudgets(d, col("stratum"), col("toks"),
      alpha = 0.3, totalBudget = 800L, maxEpochs = 1.5)
    val kept = Sampling.tokenBudgetSample(d, col("doc_id"), col("stratum"),
      col("toks"), budgets, defaultBudget = 0L, salt = "tmix")
    // exclusive-prior cut: kept weight < budget + the straddler's weight
    val perStratum = kept.groupBy("stratum").agg(sum("toks").as("w"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    perStratum.foreach { case (s, w) =>
      assert(w <= budgets(s) + 16L, s"stratum $s kept $w vs budget ${budgets(s)}")
    }
    assert(perStratum.values.sum > 0)
  }

  test("composed temperature chain: hand-computed budgets drive the bucketed cut") {
    // Strata with EXACT hand-computable temperature math: A totals 100,
    // B totals 400; alpha=0.5 → pows 10/20, den 30.
    //   uncapped, budget 300: A floor(10/30·300)=100, B floor(20/30·300)=200
    //   maxEpochs=0.5: capOf(A)=50 → A caps first; the freed 250 water-
    //   fills to B alone (floor(250)=250) which then hits ITS cap 200.
    val rows = (0 until 10).map(i => (i.toLong, "A", 10L)) ++
      (10 until 20).map(i => (i.toLong, "B", 40L))
    val d = rows.toDF("doc_id", "lang", "toks")
    assert(Sampling.temperatureBudgets(d, col("lang"), col("toks"),
      alpha = 0.5, totalBudget = 300L) === Map("A" -> 100L, "B" -> 200L))
    val capped = Sampling.temperatureBudgets(d, col("lang"), col("toks"),
      alpha = 0.5, totalBudget = 300L, maxEpochs = 0.5)
    assert(capped === Map("A" -> 50L, "B" -> 200L))
    // the composed chain (budgets → bucketed exact cut, the tp22 plan)
    // keeps exactly the hash-order prefix of each stratum's budget:
    // 50/10 → 5 A-docs, 200/40 → 5 B-docs, no straddler (exact fits)
    val kept = Sampling.tokenBudgetSampleBucketed(d, col("doc_id"), col("lang"),
      col("toks"), capped, defaultBudget = 0L, salt = "tchain")
    val perStratum = kept.groupBy("lang").agg(
      count(lit(1)).as("n"), sum("toks").as("w"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(perStratum === Map("A" -> ((5L, 50L)), "B" -> ((5L, 200L))))
    // and the bucketed composition equals the plain-sampler composition
    val plain = Sampling.tokenBudgetSample(d, col("doc_id"), col("lang"),
      col("toks"), capped, defaultBudget = 0L, salt = "tchain")
      .orderBy("doc_id").collect().toSeq
    assert(kept.orderBy("doc_id").collect().toSeq === plain)

    // admission-fraction edges (the streaming refresh math): alpha=1
    // admits everything (natural mix IS the target); non-positive and
    // empty totals are excluded/empty
    assert(Sampling.temperatureAdmissionFractions(Map("A" -> 100L, "B" -> 400L), 1.0)
      === Map("A" -> 1.0, "B" -> 1.0))
    assert(Sampling.temperatureAdmissionFractions(Map("A" -> 0L, "B" -> -5L), 0.5)
      === Map.empty)
    assert(Sampling.temperatureAdmissionFractions(Map.empty, 0.3) === Map.empty)
  }

  test("tokenBudgetSampleBucketed == tokenBudgetSample row-for-row") {
    // hot stratum + small strata, negative weights (clamp), a zero
    // budget, the default budget, hashBuckets from 2 to >> rows-per-
    // bucket — the cut must be the same hash-order prefix everywhere
    val rows = (0 until 500).map(i =>
      (i.toLong, if (i % 3 == 0) "hot" else s"s${i % 5}",
        if (i % 11 == 0) -50L else (i % 40).toLong))
    val d = rows.toDF("doc_id", "source", "toks")
    val budgets = Map("hot" -> 900L, "s1" -> 200L, "s2" -> 0L)
    val plain = Sampling.tokenBudgetSample(d, col("doc_id"), col("source"),
      col("toks"), budgets, defaultBudget = 120L, salt = "bk")
      .orderBy("doc_id").collect().toSeq
    assert(plain.nonEmpty && plain.size < 500) // the budgets genuinely cut
    for (b <- Seq(2, 32, 256)) {
      val bucketed = Sampling.tokenBudgetSampleBucketed(d, col("doc_id"),
        col("source"), col("toks"), budgets, defaultBudget = 120L,
        salt = "bk", hashBuckets = b).orderBy("doc_id").collect().toSeq
      assert(bucketed == plain, s"hashBuckets=$b")
    }
    val out = Sampling.tokenBudgetSampleBucketed(d, col("doc_id"), col("source"),
      col("toks"), budgets, defaultBudget = 120L, salt = "bk")
    assert(out.columns.toSeq == d.columns.toSeq)
    intercept[IllegalArgumentException] {
      Sampling.tokenBudgetSampleBucketed(d, col("doc_id"), col("source"),
        col("toks"), budgets, hashBuckets = 12)
    }
  }

  test("topFractionByScoreBucketed == topFractionByScore row-for-row") {
    // score ties across docs, NULL scores, singleton strata, fraction
    // endpoints, bucket counts beyond the distinct-score count — the
    // percent_rank cut must match the plain form exactly everywhere
    val rows = (0 until 400).map { i =>
      val score: java.lang.Double = if (i % 13 == 0) null else (i % 25) / 10.0
      (i.toLong, if (i % 2 == 0) "hot" else s"s${i % 7}", score)
    } :+ ((400L, "solo", (1.0: java.lang.Double)))
    val d = rows.toDF("doc_id", "lang", "score")
    for (f <- Seq(0.0, 0.3, 1.0)) {
      val plain = Sampling.topFractionByScore(d, col("lang"), col("score"),
        col("doc_id"), f).orderBy("doc_id").collect().toSeq
      for (b <- Seq(2, 8, 64)) {
        val bucketed = Sampling.topFractionByScoreBucketed(d, col("lang"),
          col("score"), col("doc_id"), f, scoreBuckets = b)
          .orderBy("doc_id").collect().toSeq
        assert(bucketed == plain, s"fraction=$f scoreBuckets=$b")
      }
      // the ADAPTIVE grid (scoreBuckets = 0): identical output with
      // the ladder choosing the grid. target 16 over the 200-row hot
      // stratum realizes b = 8 on a 16-wide fine sketch (stride 2 —
      // the boundary-subset path), and a huge target floors at b = 2;
      // the default (32768) also floors here
      for ((tgt, maxB) <- Seq((16L, 16), (1000000L, 16), (32768L, 1024))) {
        val adaptive = Sampling.topFractionByScoreBucketed(d, col("lang"),
          col("score"), col("doc_id"), f,
          targetBucketRows = tgt, maxScoreBuckets = maxB)
          .orderBy("doc_id").collect().toSeq
        assert(adaptive == plain, s"fraction=$f adaptive target=$tgt maxB=$maxB")
      }
    }
    val out = Sampling.topFractionByScoreBucketed(d, col("lang"), col("score"),
      col("doc_id"), 0.5)
    assert(out.columns.toSeq == d.columns.toSeq)
    // the exact window partitions on (stratum, bucket) — a dominant
    // stratum's sort spreads instead of serializing into one task
    val plan = out.queryExecution.optimizedPlan.toString
    assert(plan.contains("_bucket"), plan.take(1200))
  }

  test("topFractionByScore: hot-stratum telemetry observes exact stratum sizes") {
    graft.quality.SkewTelemetry.reset()
    val d = (0 until 300).map(i =>
      (i.toLong, if (i < 200) "hot" else s"s${i % 4}", i / 10.0))
      .toDF("doc_id", "lang", "score")
    Sampling.topFractionByScore(d, col("lang"), col("score"), col("doc_id"),
      0.5, hotStratumMinRows = 100L)
      .write.mode("overwrite").format("noop").save()
    // observe metrics land on the listener asynchronously
    val ev = (0 until 50).view.map { _ =>
      Thread.sleep(100); graft.quality.SkewTelemetry.lastEvent
    }.collectFirst { case Some(e) if e.metric.contains("stratumwindow") => e }
    assert(ev.isDefined, "no stratumwindow skew event observed")
    assert(ev.get.oversizedBuckets == 1L, ev.get.toString) // 200 of 300 rows on one stratum
    assert(ev.get.maxBucketSize == 200L, ev.get.toString)

    // hot_groups is a genuine COUNT of strata past the bound, not a
    // dominance flag: at bound 25 the hot stratum AND all four 25-row
    // cold strata report — five oversized sort tasks, five counted
    graft.quality.SkewTelemetry.reset()
    Sampling.topFractionByScore(d, col("lang"), col("score"), col("doc_id"),
      0.5, hotStratumMinRows = 25L)
      .write.mode("overwrite").format("noop").save()
    val ev2 = (0 until 50).view.map { _ =>
      Thread.sleep(100); graft.quality.SkewTelemetry.lastEvent
    }.collectFirst { case Some(e) if e.metric.contains("stratumwindow") => e }
    assert(ev2.isDefined, "no stratumwindow skew event observed")
    assert(ev2.get.oversizedBuckets == 5L, ev2.get.toString)
  }

  test("bucketed samplers: broadcast size gate, gated ≡ forced on both sides") {
    // Auto-broadcast pinned OFF so the join strategy reflects the
    // operators' HINT decision, not the test corpus's tiny statistics
    // (at the 100 TB regime the gate exists for, the stratum-level
    // frames never auto-broadcast) — the LineDedup gate-spec pattern.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val d = (0 until 300).map(i =>
        (i.toLong, if (i % 3 == 0) "hot" else s"s${i % 5}", (i % 40).toLong))
        .toDF("doc_id", "source", "toks")
      def nBroadcasts(df: org.apache.spark.sql.DataFrame): Int =
        "BroadcastHashJoin".r
          .findAllIn(df.queryExecution.executedPlan.toString).size

      // tokenBudgetSampleBucketed: one gated hint (the offsets join).
      val budgets = Map("hot" -> 900L, "s1" -> 200L)
      def budgetCut(maxRows: Long) = Sampling.tokenBudgetSampleBucketed(
        d, col("doc_id"), col("source"), col("toks"), budgets,
        defaultBudget = 120L, salt = "gate", hashBuckets = 8,
        broadcastMaxRows = maxRows)
      val underB = budgetCut(Long.MaxValue)
      val overB = budgetCut(0L)
      assert(nBroadcasts(underB) === 1, underB.queryExecution.executedPlan.toString)
      assert(nBroadcasts(overB) === 0, overB.queryExecution.executedPlan.toString)
      assert(overB.orderBy("doc_id").collect().toSeq ===
        underB.orderBy("doc_id").collect().toSeq)

      // topFractionByScoreBucketed: two gated hints (bounds + offsets),
      // priced by ONE stratum count — 6 strata here, offsets ≤ 6×8 rows.
      // The bounds join executes on BOTH sides of the offsets join (the
      // bucketed subtree feeds the offsets aggregate and the probe
      // side), so a hinted bounds join shows up twice in the plan.
      def rankCut(maxRows: Long) = Sampling.topFractionByScoreBucketed(
        d, col("source"), col("toks"), col("doc_id"), fraction = 0.5,
        scoreBuckets = 8, broadcastMaxRows = maxRows)
      val underR = rankCut(Long.MaxValue)
      val overR = rankCut(0L)
      // mixed region: bounds (6 rows) under the gate, offsets (≤ 48)
      // over it — only the bounds hint (×2 in the plan) survives
      val midR = rankCut(6L)
      assert(nBroadcasts(underR) === 3, underR.queryExecution.executedPlan.toString)
      assert(nBroadcasts(overR) === 0, overR.queryExecution.executedPlan.toString)
      assert(nBroadcasts(midR) === 2, midR.queryExecution.executedPlan.toString)
      val expectR = underR.orderBy("doc_id").collect().toSeq
      assert(overR.orderBy("doc_id").collect().toSeq === expectR)
      assert(midR.orderBy("doc_id").collect().toSeq === expectR)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
