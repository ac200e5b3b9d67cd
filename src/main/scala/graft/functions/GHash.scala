package graft.functions

/** The graft replayable hash family: every hashing step used by the
  * probabilistic dedup/ANN operators (shingle hashes, MinHash
  * permutations, SimHash token hashes, SRP plane components, LSH band
  * buckets) is built from arithmetic an independent SQL engine can
  * replay exactly — xor, multiply, add and shifts mod 2^64 — so the
  * whole family is oracle-checkable, not just rows-only.
  *
  * Building blocks:
  *   - FNV-1a 64 over UTF-8 bytes (string → u64): a fold of
  *     `(h ^ byte) * FnvPrime mod 2^64` — in SQL, `list_reduce` with
  *     `xor` + `*` + `%` over HUGEINT (proven exact by the t5 rolling
  *     hash oracle pattern).
  *   - gmix64 finalizer `(x ^ (x >>> 32)) * FnvPrime mod 2^64`:
  *     one xorshift + multiply, mixing high bits into the low half
  *     (a bare multiply-add can never move information downward).
  *   - Multiply-add permutations `(a·x + b) mod 2^64` with odd `a`:
  *     a true bijection of Z_2^64, compared UNSIGNED so the min is
  *     dominated by the well-mixed high bits. Constants come from
  *     splitmix64 (Scala-side only) and are inlined as decimal
  *     literals into the oracle SQL — the SQL engine never needs to
  *     derive them.
  *
  * `a` constants are masked to 62 bits so the oracle's HUGEINT
  * (int128) product `a * x` with x < 2^64 stays below 2^126 and never
  * overflows.
  *
  * Caveat (same as the t5 oracle): Spark-side string hashing iterates
  * UTF-8 bytes while the DuckDB replay iterates codepoints — equal on
  * ASCII corpora; a production oracle would normalize both sides to
  * codepoints.
  */
object GHash {

  /** FNV-1a 64-bit offset basis (unsigned 14695981039346656037). */
  val FnvOffset: Long = 0xcbf29ce484222325L

  /** FNV-1a 64-bit prime (1099511628211, ~2^40 — HUGEINT-safe). */
  val FnvPrime: Long = 0x100000001b3L

  /** splitmix64 — used ONLY to derive constants on the Scala side;
    * never replayed in SQL (its 64-bit multipliers would overflow
    * HUGEINT products). */
  def splitmix64(seed: Long): Long = {
    var z = seed + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** FNV-1a 64 over UTF-8 bytes — reference implementation (the
    * Catalyst kernel in [[HashShingles]] computes the identical fold
    * over UTF8String bytes without allocation). */
  def fnv1a(s: String): Long = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var h = FnvOffset
    var i = 0
    while (i < bytes.length) {
      h = (h ^ (bytes(i) & 0xFF)) * FnvPrime
      i += 1
    }
    h
  }

  /** Finalizer: one xorshift + FNV-prime multiply, wrapping mod 2^64.
    * SQL replay: `(xor(x, x // 2^32) * 1099511628211) % 2^64`. */
  def gmix64(x: Long): Long = (x ^ (x >>> 32)) * FnvPrime

  // -------------------------------------------------------------------
  // MinHash permutation constants: perm_j(x) = permA(j)·x + permB(j)
  // (wrapping), minimized under UNSIGNED comparison.
  // -------------------------------------------------------------------

  private val PermStream = 0x5045524dL << 32 // "PERM"
  private val SrpStream = 0x53525053L << 32 // "SRPS"

  private def permARaw(j: Int): Long =
    (splitmix64(PermStream + 2L * j) | 1L) & 0x3FFFFFFFFFFFFFFFL
  private def permBRaw(j: Int): Long = splitmix64(PermStream + 2L * j + 1L)

  // The constants are pure functions of j (and (salt, j) for SRP), but
  // the kernels ask for them once per ROW per hash function — tabulate
  // the realistic index range once per JVM so the hot path pays an
  // array read, not a splitmix chain (out-of-range indexes fall back
  // to direct derivation).
  private val PermCacheSize = 1024
  private lazy val permATab: Array[Long] = Array.tabulate(PermCacheSize)(permARaw)
  private lazy val permBTab: Array[Long] = Array.tabulate(PermCacheSize)(permBRaw)

  /** Odd 62-bit multiplier for MinHash permutation j. */
  def permA(j: Int): Long =
    if (j >= 0 && j < PermCacheSize) permATab(j) else permARaw(j)

  /** 64-bit offset for MinHash permutation j. */
  def permB(j: Int): Long =
    if (j >= 0 && j < PermCacheSize) permBTab(j) else permBRaw(j)

  /** Signature element for an EMPTY shingle set: unsigned max, so
    * empty sets sort after everything and never fake a small min. */
  val EmptySigElement: Long = -1L

  // -------------------------------------------------------------------
  // SRP (sign-random-projection) plane constants, per (salt, j).
  // Plane component i = (gmix64(srpA·(i+1) + srpB) >>> 54)/1024 − 0.5
  // — uniform-ish in [-0.5, 0.5), non-linear in i via the gmix64
  // finalizer (a bare a·i+b top-bit extraction would make the plane a
  // structured Weyl sequence).
  // -------------------------------------------------------------------

  private def srpARaw(salt: Int, j: Int): Long =
    (splitmix64(SrpStream + (salt.toLong << 16) + 2L * j) | 1L) & 0x3FFFFFFFFFFFFFFFL

  private def srpBRaw(salt: Int, j: Int): Long =
    splitmix64(SrpStream + (salt.toLong << 16) + 2L * j + 1L)

  private val SrpSaltCacheSize = 64
  private val SrpBitCacheSize = 32
  private lazy val srpATab: Array[Long] =
    Array.tabulate(SrpSaltCacheSize * SrpBitCacheSize)(k =>
      srpARaw(k / SrpBitCacheSize, k % SrpBitCacheSize))
  private lazy val srpBTab: Array[Long] =
    Array.tabulate(SrpSaltCacheSize * SrpBitCacheSize)(k =>
      srpBRaw(k / SrpBitCacheSize, k % SrpBitCacheSize))

  private def srpCached(salt: Int, j: Int): Boolean =
    salt >= 0 && salt < SrpSaltCacheSize && j >= 0 && j < SrpBitCacheSize

  def srpA(salt: Int, j: Int): Long =
    if (srpCached(salt, j)) srpATab(salt * SrpBitCacheSize + j) else srpARaw(salt, j)

  def srpB(salt: Int, j: Int): Long =
    if (srpCached(salt, j)) srpBTab(salt * SrpBitCacheSize + j) else srpBRaw(salt, j)

  /** Plane component — reference implementation shared by the
    * [[SrpSignature]] kernel and tests. */
  def srpPlane(salt: Int, j: Int, i: Int): Double =
    ((gmix64(srpA(salt, j) * (i + 1L) + srpB(salt, j)) >>> 54) / 1024.0) - 0.5

  /** Decimal literal of a long's UNSIGNED value — for inlining
    * constants into oracle SQL as HUGEINT literals. */
  def u64(x: Long): String = java.lang.Long.toUnsignedString(x)
}
