package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.GHash

/** Bounded-state approximate aggregates — the sketch family a
  * 100 TB pipeline reaches for when an exact aggregate's state would
  * not fit (or would shuffle too much): count-min frequency estimation
  * (Cormode & Muthukrishnan 2005) and KMV distinct counting
  * (Bar-Yossef et al. 2002, the k-minimum-values estimator).
  *
  * Everything here is INTEGER-exact on purpose: the hashes are the
  * corpus-wide `gmix64(fnv1a(token))` chain every signature family
  * already replays in SQL, the count-min cells are plain sums, and the
  * KMV estimate is a floor division in unsigned-64 arithmetic — so the
  * DuckDB oracle reproduces every output bit, unlike float-mixing
  * sketches (HLL's harmonic mean) whose last-ulp behavior is
  * engine-private.
  *
  * Scale shape: both sketches collapse the token INSTANCE stream to
  * the (token, count) / distinct-token frame first — one linear hash
  * shuffle — and everything after is bounded by the sketch parameters,
  * not the corpus: count-min state is depth × width cells (16 K rows
  * here — broadcastable), KMV state is k 64-bit values (a TakeOrdered,
  * never a global sort). That is the point of a sketch: the same
  * operators run unchanged as streaming accumulators because their
  * state never grows with the data. */
object Sketches {

  private val TwoTo64 = new java.math.BigDecimal("18446744073709551616")

  /** Signed long column reinterpreted as its unsigned value, as
    * DECIMAL(22,0) — the order the sketch math needs. */
  private def unsignedDec(c: Column): Column =
    c.cast(DecimalType(22, 0)) +
      when(c < 0, lit(TwoTo64)).otherwise(lit(java.math.BigDecimal.ZERO))

  /** Exact floor division of two non-negative decimal columns:
    * subtract the remainder (exact decimal op) before dividing, so the
    * quotient is integral and no rounding-mode edge can disagree with
    * the oracle's integer `//`. The quotient is clamped to
    * Long.MaxValue before the cast: with ANSI off an overflowing
    * decimal→long cast yields NULL silently. The clamp is reachable
    * only when the k-th smallest hash u_k < (k-1)·2^64 / 2^63 ≈ 510,
    * i.e. ~2^55 distinct tokens — far beyond any corpus this runs on,
    * but a sketch must degrade to a saturated estimate, never to
    * NULL. */
  private def floorDiv(num: Column, den: Column): Column =
    least((num - num % den) / den, lit(java.math.BigDecimal.valueOf(Long.MaxValue)))
      .cast("long")

  /** Token instance stream of `textCol` under the corpus-standard
    * normal form — the shared front of both sketches. */
  private def instances(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(
      TextAnalysis.tokens(TextAnalysis.normalized(col(textCol)))).as("tok"))

  /** Count-min bucket of hash `hv` for sketch row `j`: the same
    * multiply-add permutation family the minhash signatures use
    * ([[GHash.permA]]/[[GHash.permB]], wrapping mod-2^64), masked to a
    * power-of-two `width` (unsigned mod == bitwise AND, sign-safe). */
  private def cmsBucket(hv: Column, j: Int, width: Int): Column =
    (hv * lit(GHash.permA(j)) + lit(GHash.permB(j))).bitwiseAND(lit(width - 1L))

  /** Count-min sketch over the corpus token frequencies, evaluated at
    * the exact top-`topK` tokens: per probe token, the exact count,
    * the count-min estimate (min over `depth` rows of the hashed cell
    * sums) and the overcount — the one-sided error the sketch
    * guarantees (estimate ≥ truth; E[over] ≤ 2·N/width per row).
    *
    * The cells frame is depth × width rows regardless of corpus size,
    * so the probe join broadcasts the SKETCH, and the only data-sized
    * stages are the instance collapse to (token, count) and the exact
    * top-k (TakeOrderedAndProject). Output: `tok`, `n_exact`, `n_cms`,
    * `overcount`, all integer-exact. */
  def cmsTopkCounts(
      docs: DataFrame,
      textCol: String,
      depth: Int = 4,
      width: Int = 1024,
      topK: Int = 20,
  ): DataFrame =
    cmsTopkCountsFromCells(docs, textCol, cmsCells(docs, textCol, depth, width),
      depth, width, topK)

  private def requireCmsParams(depth: Int, width: Int): Unit = {
    // depth caps at 30, not 32: each row j draws its permutation from
    // the same [[GHash.permA]]/[[GHash.permB]] stream the DuckDB
    // oracle materializes as a 30-entry list (SparkEntry.MinhashH) —
    // a depth beyond that list would index the oracle's array out of
    // bounds (NULL in DuckDB) and silently corrupt its buckets.
    require(depth >= 1 && depth <= 30, s"depth must be in [1,30], got $depth")
    require(width >= 2 && (width & (width - 1)) == 0, s"width must be a power of two, got $width")
  }

  /** Per-token `(tok, n_exact, hv)` collapse of the instance stream —
    * the shared front of the cells frame and the probe set. */
  private def tokenCounts(docs: DataFrame, textCol: String): DataFrame =
    instances(docs, textCol)
      .groupBy("tok").agg(count(lit(1)).as("n_exact"))
      .withColumn("hv", call_function("graft_token_hash", col("tok")))

  private def jBuckets(c: Column, depth: Int, width: Int): Column =
    explode(array((0 until depth).map(j =>
      struct(lit(j).as("j"), cmsBucket(c, j, width).as("bucket"))): _*))

  /** The count-min SKETCH itself as a frame: `(j, bucket, cell)` with
    * cell(j, b) = Σ counts of tokens hashing there — identical to
    * counting instances directly, paid on the collapsed (token, count)
    * frame. At most depth × width rows regardless of corpus size.
    *
    * Cells are plain sums, so the sketch is MERGEABLE by construction:
    * [[cmsMerge]] of the cells of two disjoint corpus parts equals the
    * cells of their union exactly (bit-for-bit, not approximately) —
    * the property that lets the sketch run as a per-partition or
    * per-micro-batch accumulator. SketchesSpec proves merge ≡
    * recompute; the `t18_cms_merge` query oracle-checks a two-part
    * merge against the whole-corpus SQL replay. */
  def cmsCells(
      docs: DataFrame,
      textCol: String,
      depth: Int = 4,
      width: Int = 1024,
  ): DataFrame = {
    requireCmsParams(depth, width)
    tokenCounts(docs, textCol)
      .select(jBuckets(col("hv"), depth, width).as("jb"), col("n_exact"))
      .groupBy(col("jb.j").as("j"), col("jb.bucket").as("bucket"))
      .agg(sum("n_exact").as("cell"))
  }

  /** Merge two count-min cells frames (same depth/width): cells are
    * linear, so merged = summed. Absent (j, bucket) rows are implicit
    * zeros, hence the full outer union shape. */
  def cmsMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("j"), col("bucket"))
      .agg(sum("cell").as("cell"))

  /** Evaluate a (possibly merged) cells frame at the exact top-`topK`
    * tokens of `docs`: per probe token, the exact count, the count-min
    * estimate (min over `depth` rows of the hashed cell sums) and the
    * one-sided overcount (estimate ≥ truth; E[over] ≤ 2·N/width per
    * row). The cells frame is depth × width rows, so the probe join
    * broadcasts the SKETCH; the only data-sized stages are the
    * instance collapse and the exact top-k (TakeOrderedAndProject).
    * Output: `tok`, `n_exact`, `n_cms`, `overcount`, integer-exact. */
  def cmsTopkCountsFromCells(
      docs: DataFrame,
      textCol: String,
      cells: DataFrame,
      depth: Int = 4,
      width: Int = 1024,
      topK: Int = 20,
  ): DataFrame = {
    requireCmsParams(depth, width)
    val probes = tokenCounts(docs, textCol)
      .orderBy(col("n_exact").desc, col("tok").asc).limit(topK)
      .select(col("tok"), col("n_exact"), jBuckets(col("hv"), depth, width).as("jb"))
      .select(col("tok"), col("n_exact"), col("jb.j").as("j"), col("jb.bucket").as("bucket"))
    probes.join(broadcast(cells), Seq("j", "bucket"))
      .groupBy("tok")
      .agg(
        first(col("n_exact")).as("n_exact"),
        min(col("cell")).as("n_cms"))
      .select(
        col("tok"),
        col("n_exact"),
        col("n_cms"),
        (col("n_cms") - col("n_exact")).as("overcount"))
  }

  /** KMV (k-minimum-values) distinct-token estimator: keep the k
    * smallest distinct unsigned token hashes; with the k-th smallest at
    * unsigned value u, the hashes are ~uniform on [0, 2^64), so the
    * distinct count ≈ (k-1) · 2^64 / u. Below k distinct values the
    * sketch IS the exact set and the estimate is exact.
    *
    * One row out: `n_distinct_exact`, `k_used`, `est_distinct`,
    * `rel_err` (signed, rounded to 6). The sketch state is k longs —
    * a TakeOrdered over the distinct-token frame, never a global
    * sort — which is what makes it a mergeable streaming accumulator
    * (union two sketches = merge-take-k). */
  def kmvDistinct(
      docs: DataFrame,
      textCol: String,
      k: Int = 256,
  ): DataFrame =
    kmvDistinctFromSketch(docs, textCol, kmvSketch(docs, textCol, k), k)

  /** The KMV SKETCH itself as a frame: the k smallest DISTINCT
    * unsigned token hashes of the corpus, one `u` DECIMAL(22,0) column
    * (fewer than k rows iff the corpus has fewer than k distinct
    * tokens — the regime where the sketch is the exact set).
    *
    * Mergeable by construction: the k smallest of a union are all
    * members of each part's k smallest, so [[kmvMerge]] (union →
    * distinct → take-k) of two parts equals the sketch of their union
    * exactly. Distinct matters: the same token appears in both parts
    * with the same hash, and a duplicated u would displace a genuine
    * k-th value. SketchesSpec proves merge ≡ recompute; the
    * `t19_kmv_merge` query oracle-checks a two-part merge against the
    * whole-corpus SQL replay. */
  def kmvSketch(
      docs: DataFrame,
      textCol: String,
      k: Int = 256,
  ): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    instances(docs, textCol)
      .select(col("tok")).distinct()
      .select(unsignedDec(call_function("graft_token_hash", col("tok"))).as("u"))
      .orderBy(col("u").asc).limit(k)
  }

  /** Merge two KMV sketch frames built with the same k: the k smallest
    * distinct values of the union. TakeOrdered over ≤ 2k rows. */
  def kmvMerge(a: DataFrame, b: DataFrame, k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    a.unionByName(b).distinct().orderBy(col("u").asc).limit(k)
  }

  /** Estimate from a (possibly merged) sketch frame, compared against
    * the exact distinct count of `docs` — same output contract as
    * [[kmvDistinct]]: `n_distinct_exact`, `k_used`, `est_distinct`,
    * `rel_err`. */
  def kmvDistinctFromSketch(
      docs: DataFrame,
      textCol: String,
      sketch: DataFrame,
      k: Int = 256,
  ): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val nRow = instances(docs, textCol)
      .select(col("tok")).distinct()
      .agg(count(lit(1)).as("n_exact"))
    val kth = sketch
      .agg(count(lit(1)).as("k_used"), max(col("u")).as("uk"))
    val num = lit(TwoTo64.multiply(new java.math.BigDecimal(k - 1)))
    nRow.crossJoin(kth)
      .select(
        col("n_exact").as("n_distinct_exact"),
        coalesce(col("k_used"), lit(0L)).cast("int").as("k_used"),
        when(col("k_used") < k || col("uk") === 0 || col("uk").isNull, col("n_exact"))
          .otherwise(floorDiv(num, col("uk"))).as("est_distinct"))
      .select(
        col("n_distinct_exact"),
        col("k_used"),
        col("est_distinct"),
        when(col("n_distinct_exact") === 0, lit(0.0))
          .otherwise(round(
            (col("est_distinct") - col("n_distinct_exact")).cast("double") /
              col("n_distinct_exact").cast("double"), 6)).as("rel_err"))
  }

  // -------------------------------------------------------------------
  // HyperLogLog (Flajolet et al. 2007), integer-exact variant.
  //
  // The header comment above rules out float-mixing sketches because
  // their last-ulp behavior is engine-private — so this HLL is built
  // to produce NO float anywhere the oracle compares:
  //   - rank = leading-zero count over a fixed 40-bit window of the
  //     hash (a generated comparison chain against power-of-two
  //     literals, not floor(log2(w)): double log2 mis-floors near
  //     2^k boundaries once w exceeds ~2^45);
  //   - the harmonic mean denominator is the exact integer
  //     S = Σ_j 2^(Rank_max − r_j) (zero registers contribute
  //     2^Rank_max), ≤ m · 2^41 — a plain BIGINT sum;
  //   - alpha_m enters as a fixed-point rational (round(alpha · 10^6)
  //     over 10^6), so the estimate is one exact floor division;
  //   - the small-range linear-counting branch m·ln(m/V) is a
  //     LOOKUP TABLE of m precomputed integers (V has only m possible
  //     values), interpolated identically into both engines.
  // Deviations from canonical 64-bit HLL, both documented trade-offs:
  // the rank window is 40 bits, not 64−p (an all-zero 40-bit run has
  // probability 2^-40 per bucket — unobservable; keeps every
  // intermediate in BIGINT range), and alpha is 6-decimal fixed-point
  // (a <1e-6 relative perturbation, far under the 1.04/√m sketch
  // error).
  // -------------------------------------------------------------------

  /** Rank window width in bits; max rank = RankBits + 1. */
  val HllRankBits = 40

  /** Fixed-point alpha_m numerator over [[HllAlphaDen]]:
    * round(10^6 · 0.7213 / (1 + 1.079 / m)). */
  def hllAlphaNum(m: Int): Long =
    math.round(1e6 * 0.7213 / (1.0 + 1.079 / m))
  val HllAlphaDen = 1000000L

  /** Linear-counting lookup: lc(v) = round(m · ln(m / v)) for
    * v = 1..m zero registers (v = m → 0; the v = 0 case never reaches
    * the table — the branch requires v > 0). Precomputed in Scala and
    * interpolated as the same literal list into the oracle SQL, so the
    * one ln() in HLL never executes inside either engine. */
  def hllLinearCountTable(m: Int): IndexedSeq[Long] =
    (1 to m).map(v => math.round(m * math.log(m.toDouble / v)))

  private def requireHllParams(p: Int): Unit =
    require(p >= 4 && p <= 14, s"p must be in [4,14], got $p")

  /** The HLL SKETCH itself as a frame: `(bucket, r)` — the max rank
    * per occupied bucket, at most m = 2^p rows regardless of corpus
    * size. bucket = low p bits of the token hash; rank = leading-zero
    * count + 1 over the next [[HllRankBits]] bits (so r ∈ [1, 41]).
    *
    * Mergeable by construction: registers combine by per-bucket MAX,
    * so [[hllMerge]] of two disjoint corpus parts equals the sketch of
    * their union exactly (bit-for-bit — max is idempotent,
    * commutative, associative), the same per-partition /
    * per-micro-batch accumulator contract as [[cmsCells]] /
    * [[kmvSketch]]. SketchesSpec proves merge ≡ recompute; the
    * `t21_hll_merge` query oracle-checks a two-part merge against the
    * whole-corpus SQL replay. */
  def hllRegisters(
      docs: DataFrame,
      textCol: String,
      p: Int = 8,
  ): DataFrame = {
    requireHllParams(p)
    val m = 1 << p
    val hv = call_function("graft_token_hash", col("tok"))
    val bucket = hv.bitwiseAND(lit(m - 1L))
    val w = shiftrightunsigned(hv, p).bitwiseAND(lit((1L << HllRankBits) - 1))
    // rank = RankBits - floor(log2(w)) for w > 0, else RankBits + 1:
    // a descending integer comparison chain, no float log anywhere.
    val fl = (HllRankBits - 2 to 0 by -1).foldLeft(
      when(w >= lit(1L << (HllRankBits - 1)), lit(HllRankBits - 1))) {
      (acc, j) => acc.when(w >= lit(1L << j), lit(j))
    }
    val rank = when(w === 0, lit(HllRankBits + 1))
      .otherwise(lit(HllRankBits) - fl)
    instances(docs, textCol)
      .select(col("tok")).distinct()
      .select(bucket.as("bucket"), rank.as("r"))
      .groupBy("bucket").agg(max(col("r")).as("r"))
  }

  /** Merge two HLL register frames built with the same p: per-bucket
    * max. Absent buckets are implicit rank-0 registers, hence the
    * union shape. At most 2m input rows. */
  def hllMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("bucket").agg(max(col("r")).as("r"))

  /** Distinct-token estimate from a (possibly merged) register frame,
    * compared against the exact distinct count of `docs`. Output one
    * row: `n_distinct_exact`, `m`, `v_zero` (empty registers),
    * `est_distinct`, `rel_err` (signed, rounded to 6) — the same
    * contract as [[kmvDistinctFromSketch]].
    *
    * est = floor(alphaNum · m² · 2^(RankBits+1) / (alphaDen · S)) with
    * S = v_zero · 2^(RankBits+1) + Σ 2^(RankBits+1−r); when v_zero > 0
    * and the raw estimate ≤ 5m/2, the canonical small-range branch
    * takes over via the precomputed [[hllLinearCountTable]]. The
    * 64-bit large-range correction is unnecessary (no 32-bit hash
    * collision regime) and omitted. */
  def hllDistinctFromRegisters(
      docs: DataFrame,
      textCol: String,
      registers: DataFrame,
      p: Int = 8,
  ): DataFrame = {
    requireHllParams(p)
    val m = 1 << p
    val scaleExp = HllRankBits + 1 // term(r) = 2^(scaleExp - r), r ∈ [0, 41]
    val nRow = instances(docs, textCol)
      .select(col("tok")).distinct()
      .agg(count(lit(1)).as("n_exact"))
    // term(r) = 2^(scaleExp − r) via a 1-indexed literal lookup
    // (shiftleft's bit count is a static Int in the DSL, and a lookup
    // matches the oracle's element_at replay literal-for-literal).
    val termByRank = array((1 to scaleExp).map(r => lit(1L << (scaleExp - r))): _*)
    val sRow = registers
      .agg(
        count(lit(1)).cast("long").as("occupied"),
        coalesce(sum(element_at(termByRank, col("r").cast("int"))), lit(0L))
          .as("s_occ"))
      .select(
        (lit(m.toLong) - col("occupied")).as("v_zero"),
        ((lit(m.toLong) - col("occupied")) * lit(1L << scaleExp) + col("s_occ")).as("s"))
    val num = new java.math.BigDecimal(hllAlphaNum(m))
      .multiply(new java.math.BigDecimal(m.toLong * m))
      .multiply(new java.math.BigDecimal(java.math.BigInteger.ONE.shiftLeft(scaleExp)))
    val lc = hllLinearCountTable(m)
    val lcCol = element_at(
      array(lc.map(lit): _*), col("v_zero").cast("int")) // 1-indexed: v_zero ∈ [1, m]
    val rawEst = floorDiv(
      lit(num), col("s").cast(DecimalType(38, 0)) * lit(HllAlphaDen))
    nRow.crossJoin(sRow)
      .select(
        col("n_exact").as("n_distinct_exact"),
        lit(m).as("m"),
        col("v_zero").cast("int").as("v_zero"),
        when(col("v_zero") > 0 && rawEst * 2 <= lit(5L * m), lcCol)
          .otherwise(rawEst).as("est_distinct"))
      .select(
        col("n_distinct_exact"),
        col("m"),
        col("v_zero"),
        col("est_distinct"),
        when(col("n_distinct_exact") === 0, lit(0.0))
          .otherwise(round(
            (col("est_distinct") - col("n_distinct_exact")).cast("double") /
              col("n_distinct_exact").cast("double"), 6)).as("rel_err"))
  }

  /** Whole-corpus HLL distinct estimate — [[hllRegisters]] +
    * [[hllDistinctFromRegisters]]. */
  def hllDistinct(
      docs: DataFrame,
      textCol: String,
      p: Int = 8,
  ): DataFrame =
    hllDistinctFromRegisters(docs, textCol, hllRegisters(docs, textCol, p), p)

  // -------------------------------------------------------------------
  // Misra–Gries heavy hitters (Misra & Gries 1982), order-free form.
  // -------------------------------------------------------------------

  /** The Misra–Gries summary in its ORDER-FREE "top-k with offset"
    * formulation (the form Agarwal et al. 2013, "Mergeable Summaries",
    * analyzes): from the exact (token, count) frame, keep the k most
    * frequent tokens under the total order (count desc, token asc)
    * with counter(x) = f(x) − t, where t is the (k+1)-th largest count
    * (0 when fewer than k+1 distinct tokens exist); boundary tokens
    * whose counter hits 0 drop. The classic streaming MG is
    * processing-order-dependent — useless under Spark's
    * nondeterministic partitioning — while this formulation is a pure
    * function of the exact counts, so two engines (and two runs)
    * agree bit-for-bit, and the DuckDB oracle replays it with a
    * ROW_NUMBER window. It satisfies the MG guarantee: ≤ k counters,
    * f(x) − m/(k+1) ≤ counter(x) ≤ f(x) (k+1 tokens each with count
    * ≥ t sum to ≤ m, so t ≤ m/(k+1)).
    *
    * Scale shape: the instance stream collapses to (token, count) —
    * one linear hash shuffle, the same front every sketch here pays —
    * and the reduce is a TakeOrdered over k+1 rows; state is ≤ k
    * (token, counter) pairs. Completes the sketch family's coverage:
    * CMS answers "how often is X" (one-sided OVERcount), MG answers
    * "which X are frequent" with a one-sided UNDERcount and a
    * deterministic membership guarantee (every token with
    * f(x) > m/(k+1) is in the summary). */
  def mgSummary(
      docs: DataFrame,
      textCol: String,
      k: Int = 64,
  ): DataFrame =
    mgReduce(
      instances(docs, textCol).groupBy("tok").agg(count(lit(1)).as("counter")),
      k)

  /** The offset reduce at the heart of the summary: top-(k+1) of the
    * counter frame under (counter desc, tok asc), subtract the
    * (k+1)-th counter from the top k, drop zeros. Everything after the
    * input frame is bounded by k (TakeOrderedAndProject, never a
    * global sort). */
  def mgReduce(counters: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val top = counters.orderBy(col("counter").desc, col("tok").asc).limit(k + 1)
    val t = top.agg(
      when(count(lit(1)) === k + 1, min(col("counter")))
        .otherwise(lit(0L)).as("t"))
    top.orderBy(col("counter").desc, col("tok").asc).limit(k)
      .crossJoin(t)
      .select(col("tok"), (col("counter") - col("t")).as("counter"))
      .filter(col("counter") > 0)
  }

  /** Merge two MG summaries built with the same k: counters are
    * additive lower bounds, so merged = per-token counter sums
    * re-reduced with the same offset rule — ≤ 2k input rows, bounded
    * work. Unlike the CMS/KMV/HLL merges this one is LOSSY (merged ≠
    * recomputed in general) but it is deterministic and keeps the
    * global guarantee: the merged summary's undercount stays ≤
    * m_total/(k+1) (Agarwal et al. 2013, Thm. 1) — the
    * `t23_mg_merge` oracle replays the two-part algebra exactly and
    * the bound rides along as a compared output column. */
  def mgMerge(a: DataFrame, b: DataFrame, k: Int): DataFrame =
    mgReduce(
      a.unionByName(b).groupBy("tok").agg(sum("counter").as("counter")),
      k)

  /** Evaluate a (possibly merged) summary at the exact top-`topK`
    * tokens of `docs`: per probe token the exact count, the MG lower
    * bound (0 when the token fell out of the summary), the one-sided
    * undercount, and `bound_ok` — the MG guarantee
    * undercount ≤ m/(k+1), checked in integer arithmetic
    * (undercount·(k+1) ≤ m) so both engines decide it identically.
    * Output: `tok, n_exact, n_mg_lower, undercount, bound_ok`. */
  def mgHeavyHitters(
      docs: DataFrame,
      textCol: String,
      summary: DataFrame,
      k: Int = 64,
      topK: Int = 20,
  ): DataFrame = {
    val cnt = instances(docs, textCol)
      .groupBy("tok").agg(count(lit(1)).as("n_exact"))
    val m = instances(docs, textCol).agg(count(lit(1)).as("m_total"))
    cnt.orderBy(col("n_exact").desc, col("tok").asc).limit(topK)
      .join(broadcast(summary), Seq("tok"), "left")
      .crossJoin(m)
      .select(
        col("tok"),
        col("n_exact"),
        coalesce(col("counter"), lit(0L)).as("n_mg_lower"),
        (col("n_exact") - coalesce(col("counter"), lit(0L))).as("undercount"),
        ((col("n_exact") - coalesce(col("counter"), lit(0L))) * lit(k + 1L)
          <= col("m_total")).as("bound_ok"))
  }

  /** Whole-corpus heavy hitters — [[mgSummary]] + [[mgHeavyHitters]]. */
  def mgTopk(
      docs: DataFrame,
      textCol: String,
      k: Int = 64,
      topK: Int = 20,
  ): DataFrame =
    mgHeavyHitters(docs, textCol, mgSummary(docs, textCol, k), k, topK)
}
