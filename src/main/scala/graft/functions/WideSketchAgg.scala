package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** ALL FIVE token-family sketch partials (CMS cells, KMV bottom-k,
  * HLL registers, exact-top-(k+1)-reduced Misra–Gries summary, Bloom
  * bits) of one corpus slice, computed in ONE aggregation pass over
  * the per-token `(tok, count, hash)` collapse.
  *
  * Why an imperative aggregate instead of composing the per-family
  * [[graft.text.Sketches]] builders: each builder is its own
  * aggregation subtree, and a micro-batch accumulator paying five
  * branch subtrees per batch spends its time on STRUCTURE — five
  * scans of the collapse, three extra shuffles, five single-row
  * broadcasts — measured at ~1 s of fixed per-batch cost even with
  * the collapse cached and every sketch parameter minimized. The
  * per-family algebra is bounded-state and trivially mergeable, which
  * is precisely the shape `TypedImperativeAggregate` exists for: the
  * buffer IS the five sketch states (cms long[depth×width] +
  * hll byte[m] + bloom bitset + two bounded heaps ≈ 40 KB at the
  * defaults), update is O(depth) per token, merge is elementwise
  * sum/max/or plus two bounded heap melds — so the whole token side
  * becomes scan → partial → one single-partition merge.
  *
  * Exactness contract (pinned by SketchesSpec against the per-family
  * builders, and transitively by StreamingIngestSpec's fold ≡
  * whole-corpus assertions): `eval` emits bit-identical rows to
  * [[graft.text.Sketches.cmsCells]] / `kmvSketch` / `hllRegisters` /
  * `mgSummary` / `bloomBits` in the exact order the wide-row
  * `sort_array(collect_list(...))` form produced — including KMV's
  * keep-duplicate-hashes-of-distinct-tokens semantics and MG's exact
  * top-(k+1) offset reduce (each token appears exactly ONCE in the
  * input collapse, so per-partition bounded heaps merge to the exact
  * global top set — this is why the aggregate consumes the collapse,
  * not the raw instance stream).
  *
  * Input: `tok` STRING, `n` LONG (exact count), `hv` LONG (the
  * corpus-standard graft_token_hash). The seven sketch parameters are
  * literal ints fixed at construction.
  */
case class WideSketchAgg(
    tokExpr: Expression,
    nExpr: Expression,
    hvExpr: Expression,
    cmsDepth: Int,
    cmsWidth: Int,
    kmvK: Int,
    hllP: Int,
    mgK: Int,
    bloomDepth: Int,
    bloomWidth: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0,
) extends TypedImperativeAggregate[WideSketchAgg.Buffer]
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  import WideSketchAgg._

  require(cmsDepth >= 1 && cmsDepth <= 30, s"cmsDepth must be in [1,30], got $cmsDepth")
  require(cmsWidth >= 2 && (cmsWidth & (cmsWidth - 1)) == 0, s"cmsWidth must be a power of two, got $cmsWidth")
  require(bloomDepth >= 1 && bloomDepth <= 30, s"bloomDepth must be in [1,30], got $bloomDepth")
  require(bloomWidth >= 2 && (bloomWidth & (bloomWidth - 1)) == 0, s"bloomWidth must be a power of two, got $bloomWidth")
  require(kmvK >= 2, s"kmvK must be >= 2, got $kmvK")
  require(hllP >= 4 && hllP <= 14, s"hllP must be in [4,14], got $hllP")
  require(mgK >= 1, s"mgK must be >= 1, got $mgK")

  override def children: Seq[Expression] = Seq(tokExpr, nExpr, hvExpr)
  override def inputTypes = Seq(StringType, LongType, LongType)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_wide_sketch"

  override def dataType: DataType = StructType(Seq(
    StructField("cms", ArrayType(StructType(Seq(
      StructField("j", IntegerType, nullable = false),
      StructField("bucket", LongType, nullable = false),
      StructField("cell", LongType, nullable = false))), containsNull = false)),
    StructField("kmv", ArrayType(DecimalType(22, 0), containsNull = false)),
    StructField("hll", ArrayType(StructType(Seq(
      StructField("bucket", LongType, nullable = false),
      StructField("r", IntegerType, nullable = false))), containsNull = false)),
    StructField("mg", ArrayType(StructType(Seq(
      StructField("tok", StringType, nullable = false),
      StructField("counter", LongType, nullable = false))), containsNull = false)),
    StructField("bloom", ArrayType(StructType(Seq(
      StructField("j", IntegerType, nullable = false),
      StructField("bucket", LongType, nullable = false))), containsNull = false))))

  private val m: Int = 1 << hllP
  private val bloomWords: Int = math.max(bloomWidth / 64, 1)
  private lazy val cmsA: Array[Long] = Array.tabulate(cmsDepth)(GHash.permA)
  private lazy val cmsB: Array[Long] = Array.tabulate(cmsDepth)(GHash.permB)
  private lazy val bloomA: Array[Long] = Array.tabulate(bloomDepth)(GHash.permA)
  private lazy val bloomB: Array[Long] = Array.tabulate(bloomDepth)(GHash.permB)

  override def createAggregationBuffer(): Buffer =
    new Buffer(
      new Array[Long](cmsDepth * cmsWidth),
      new Array[Byte](m),
      new Array[Long](bloomDepth * bloomWords),
      new java.util.PriorityQueue[java.lang.Long](kmvK, KmvOrder),
      new java.util.PriorityQueue[MgEntry](mgK + 2, MgOrder))

  override def update(b: Buffer, input: InternalRow): Buffer = {
    val tok = tokExpr.eval(input)
    if (tok == null) return b // explode never yields null; defensive
    val n = nExpr.eval(input).asInstanceOf[Long]
    val hv = hvExpr.eval(input).asInstanceOf[Long]
    var j = 0
    while (j < cmsDepth) {
      val bucket = ((hv * cmsA(j) + cmsB(j)) & (cmsWidth - 1L)).toInt
      b.cms(j * cmsWidth + bucket) += n
      j += 1
    }
    j = 0
    while (j < bloomDepth) {
      val bucket = ((hv * bloomA(j) + bloomB(j)) & (bloomWidth - 1L)).toInt
      b.bloom(j * bloomWords + (bucket >>> 6)) |= (1L << (bucket & 63))
      j += 1
    }
    // HLL: bucket = low p bits; rank = RankBits - floor(log2 w) over
    // the next RankBits bits, RankBits + 1 when they are all zero
    // (Sketches.hllBucketRank twin — integer ops only, byte
    // registers; the shared constant keeps a third derivation from
    // drifting if the rank width ever changes)
    val rb = graft.text.Sketches.HllRankBits
    val hBucket = (hv & (m - 1L)).toInt
    val w = (hv >>> hllP) & ((1L << rb) - 1)
    val rank = if (w == 0) rb + 1 else rb - (63 - java.lang.Long.numberOfLeadingZeros(w))
    if (rank > b.hll(hBucket)) b.hll(hBucket) = rank.toByte
    // KMV: k smallest UNSIGNED hashes of the distinct tokens, keeping
    // the (2^-64-improbable) duplicate-hash semantics of the builder
    kmvOffer(b.kmv, hv, kmvK)
    // MG pre-reduce state: exact top-(k+1) under (counter desc, tok
    // asc) — exact because each token appears once in the collapse
    mgOffer(b.mg, new MgEntry(tok.asInstanceOf[UTF8String].copy(), n), mgK + 1)
    b
  }

  override def merge(b: Buffer, o: Buffer): Buffer = {
    var i = 0
    while (i < b.cms.length) { b.cms(i) += o.cms(i); i += 1 }
    i = 0
    while (i < b.hll.length) { if (o.hll(i) > b.hll(i)) b.hll(i) = o.hll(i); i += 1 }
    i = 0
    while (i < b.bloom.length) { b.bloom(i) |= o.bloom(i); i += 1 }
    o.kmv.forEach(u => kmvOffer(b.kmv, u, kmvK))
    o.mg.forEach(e => mgOffer(b.mg, e, mgK + 1))
    b
  }

  override def eval(b: Buffer): Any = {
    // cms: non-zero cells in (j, bucket) order — the rows cmsCells
    // emits, in sort_array(struct(j, bucket, cell)) order
    val cmsRows = Seq.newBuilder[InternalRow]
    var j = 0
    while (j < cmsDepth) {
      var bucket = 0
      while (bucket < cmsWidth) {
        val cell = b.cms(j * cmsWidth + bucket)
        if (cell != 0L) cmsRows += InternalRow(j, bucket.toLong, cell)
        bucket += 1
      }
      j += 1
    }
    // kmv: unsigned ascending decimals
    val kmvSorted = {
      val a = new Array[java.lang.Long](b.kmv.size)
      b.kmv.toArray(a)
      java.util.Arrays.sort(a, KmvOrder.reversed())
      a.map(u => Decimal(unsignedBig(u), 22, 0))
    }
    // hll: occupied registers in bucket order
    val hllRows = Seq.newBuilder[InternalRow]
    var hb = 0
    while (hb < m) {
      if (b.hll(hb) != 0) hllRows += InternalRow(hb.toLong, b.hll(hb).toInt)
      hb += 1
    }
    // mg: the offset reduce — top-(k+1) under (counter desc, tok asc),
    // subtract the (k+1)-th counter, drop zeros, emit in tok order
    // (the sort_array(struct(tok, counter)) order of the wide row)
    val mgAll = { val a = new Array[MgEntry](b.mg.size); b.mg.toArray(a); a }
    java.util.Arrays.sort(mgAll, MgOrder.reversed())
    val t = if (mgAll.length == mgK + 1) mgAll(mgK).counter else 0L
    val mgRows = mgAll.take(mgK)
      .collect { case e if e.counter - t > 0 => (e.tok, e.counter - t) }
      .sortWith((a, b) => a._1.compareTo(b._1) < 0)
      .map { case (tok, c) => InternalRow(tok, c) }
    // bloom: set bits in (j, bucket) order
    val bloomRows = Seq.newBuilder[InternalRow]
    j = 0
    while (j < bloomDepth) {
      var wIdx = 0
      while (wIdx < bloomWords) {
        var word = b.bloom(j * bloomWords + wIdx)
        while (word != 0L) {
          val bit = java.lang.Long.numberOfTrailingZeros(word)
          bloomRows += InternalRow(j, (wIdx << 6).toLong + bit)
          word &= word - 1
        }
        wIdx += 1
      }
      j += 1
    }
    InternalRow(
      new GenericArrayData(cmsRows.result().toArray[Any]),
      new GenericArrayData(kmvSorted.toArray[Any]),
      new GenericArrayData(hllRows.result().toArray[Any]),
      new GenericArrayData(mgRows.toArray[Any]),
      new GenericArrayData(bloomRows.result().toArray[Any]))
  }

  override def serialize(b: Buffer): Array[Byte] = {
    val kmvArr = { val a = new Array[java.lang.Long](b.kmv.size); b.kmv.toArray(a); a }
    val mgArr = { val a = new Array[MgEntry](b.mg.size); b.mg.toArray(a); a }
    val mgBytes = mgArr.map(e => e.tok.getBytes)
    val size = 8 * b.cms.length + b.hll.length + 8 * b.bloom.length +
      4 + 8 * kmvArr.length +
      4 + mgArr.map(e => 8 + 4).sum + mgBytes.map(_.length).sum
    val buf = ByteBuffer.allocate(size)
    b.cms.foreach(buf.putLong)
    buf.put(b.hll)
    b.bloom.foreach(buf.putLong)
    buf.putInt(kmvArr.length)
    kmvArr.foreach(u => buf.putLong(u))
    buf.putInt(mgArr.length)
    mgArr.zip(mgBytes).foreach { case (e, tb) =>
      buf.putLong(e.counter); buf.putInt(tb.length); buf.put(tb)
    }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): Buffer = {
    val buf = ByteBuffer.wrap(bytes)
    val b = createAggregationBuffer()
    var i = 0
    while (i < b.cms.length) { b.cms(i) = buf.getLong; i += 1 }
    buf.get(b.hll)
    i = 0
    while (i < b.bloom.length) { b.bloom(i) = buf.getLong; i += 1 }
    val nk = buf.getInt
    i = 0
    while (i < nk) { b.kmv.add(buf.getLong); i += 1 }
    val nm = buf.getInt
    i = 0
    while (i < nm) {
      val c = buf.getLong
      val len = buf.getInt
      val tb = new Array[Byte](len)
      buf.get(tb)
      b.mg.add(new MgEntry(UTF8String.fromBytes(tb), c))
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): WideSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): WideSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): WideSketchAgg =
    copy(tokExpr = newChildren(0), nExpr = newChildren(1), hvExpr = newChildren(2))
}

object WideSketchAgg {

  /** The five sketch states. The heaps hold the WEAKEST element at
    * the head so a full heap replaces in O(log k). */
  final class Buffer(
      val cms: Array[Long],
      val hll: Array[Byte],
      val bloom: Array[Long],
      val kmv: java.util.PriorityQueue[java.lang.Long],
      val mg: java.util.PriorityQueue[MgEntry])

  final class MgEntry(val tok: UTF8String, val counter: Long)

  /** Keep the k SMALLEST unsigned longs: max-heap by unsigned order. */
  private val KmvOrder: java.util.Comparator[java.lang.Long] =
    (a: java.lang.Long, b: java.lang.Long) =>
      java.lang.Long.compareUnsigned(b, a) // head = largest = weakest

  /** Keep the top elements under (counter desc, tok asc): min-heap
    * whose head is the WEAKEST, i.e. smallest counter, ties broken by
    * LARGEST tok. */
  private val MgOrder: java.util.Comparator[MgEntry] =
    (a: MgEntry, b: MgEntry) => {
      val c = java.lang.Long.compare(a.counter, b.counter)
      if (c != 0) c else b.tok.compareTo(a.tok)
    }

  private def kmvOffer(
      heap: java.util.PriorityQueue[java.lang.Long], u: Long, k: Int): Unit = {
    if (heap.size < k) { heap.add(u); () }
    else if (java.lang.Long.compareUnsigned(u, heap.peek()) < 0) {
      heap.poll(); heap.add(u); ()
    }
  }

  private def mgOffer(
      heap: java.util.PriorityQueue[MgEntry], e: MgEntry, cap: Int): Unit = {
    if (heap.size < cap) { heap.add(e); () }
    else if (MgOrder.compare(e, heap.peek()) > 0) {
      heap.poll(); heap.add(e); ()
    }
  }

  private val TwoTo64 = java.math.BigDecimal.valueOf(2).pow(64)

  private def unsignedBig(v: Long): java.math.BigDecimal = {
    val d = java.math.BigDecimal.valueOf(v)
    if (v < 0) d.add(TwoTo64) else d
  }
}
