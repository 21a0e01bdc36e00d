package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mergeable KMV / theta sketches with SET ALGEBRA (Bar-Yossef et al. 2002;
  * Beyer et al. SIGMOD'07 "On synopses for distinct-value estimation";
  * Dasgupta et al., the DataSketches theta formulation) — the fifth member
  * of the stored-sketch family, and the first with a TWO-SKETCH operator:
  * where HLL answers "how many distinct", KMV answers "how many distinct,
  * AND how much do two populations OVERLAP" — the corpus-overlap /
  * contamination-triage primitive: estimate |train ∩ benchmark| from two
  * kilobyte summaries BEFORE paying for the exact decontamination join
  * (x_cross_dedup), or profile inter-snapshot overlap across hundreds of
  * corpus shards by merging per-shard sketches.
  *
  * - graft_kmv(key bigint[, k])        -> binary  (aggregate: build, default K=1024)
  * - graft_kmv_merge(sketch binary)    -> binary  (aggregate: union stored sketches)
  * - graft_kmv_stats(sketch)           -> array<double> [estimate, size, k]
  * - graft_kmv_overlap(sk1, sk2)       -> array<double>
  *       [est_a, est_b, est_intersection, est_union, jaccard]
  *
  * Mechanics: every key is scrambled through the splitmix64 finalizer (a
  * fixed bijection, so the sketch is DETERMINISTIC given the data — rerun
  * equality is testable, the x_gumbel discipline) and mapped to the
  * unsigned 64-bit line; the sketch keeps the k SMALLEST distinct hashes.
  * With fewer than k distinct keys the sketch is EXACT (size IS the
  * count). Once full, theta = the k-th smallest hash as a fraction of the
  * line and est = (k-1)/theta — the classic unbiased KMV estimator, with
  * relative standard error ~ 1/sqrt(k-2) (~3.1% at the 1024 default).
  *
  * Set algebra (the theta-sketch idea): for two sketches, cut BOTH sample
  * sets at the smaller theta — below it, each is a uniform hash sample of
  * its population with known inclusion rate theta — then count membership:
  * est_inter = |S_a ∩ S_b < theta| / theta, est_union likewise. Union via
  * merge is exact in the same sense as a single build (merge keeps the k
  * smallest of the union — bit-identical to having built one sketch over
  * both inputs, which is what makes the summaries mergeable/storable).
  *
  * Wire format is self-describing and canonical (hashes stored ascending):
  * magic 'V', version 1, k, size, then size x long. Merge REFUSES mixed-k
  * inputs (a silent mix would silently change theta's meaning).
  */
object KmvSketch {
  val K = 1024
  val Magic: Byte = 'V'
  val Version: Byte = 1

  /** Unsigned-order comparator over the hashed 64-bit line. */
  private val UnsignedOrder = new java.util.Comparator[java.lang.Long] {
    def compare(a: java.lang.Long, b: java.lang.Long): Int =
      java.lang.Long.compareUnsigned(a, b)
  }

  /** k == 0 marks an UNSET merge buffer (adopts the first input's k). */
  final class State(val set: java.util.TreeSet[java.lang.Long], var k: Int)

  def empty(k: Int = K): State =
    new State(new java.util.TreeSet[java.lang.Long](UnsignedOrder), k)
  private[functions] def unset: State =
    new State(new java.util.TreeSet[java.lang.Long](UnsignedOrder), 0)

  /** splitmix64 finalizer: a fixed 64-bit bijection with full avalanche —
    * sequential ids spread uniformly over the unsigned line.
    */
  def mix(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  def add(st: State, key: Long): Unit = {
    require(st.k >= 1, "cannot add to an unset merge buffer")
    val h = java.lang.Long.valueOf(mix(key))
    if (st.set.size() < st.k) { st.set.add(h); () }
    else if (java.lang.Long.compareUnsigned(h, st.set.last()) < 0 &&
      st.set.add(h)) {
      st.set.pollLast(); ()
    }
  }

  def mergeInto(into: State, from: State): Unit = {
    if (from.k == 0) return
    if (into.k == 0) into.k = from.k
    require(into.k == from.k,
      s"kmv k mismatch in merge: ${into.k} vs ${from.k} — mixing capacities " +
        "silently changes theta's meaning")
    val it = from.set.iterator()
    while (it.hasNext) {
      val h = it.next()
      if (into.set.size() < into.k) into.set.add(h)
      else if (java.lang.Long.compareUnsigned(h, into.set.last()) < 0 &&
        into.set.add(h)) {
        into.set.pollLast(); ()
      }
    }
  }

  /** Unsigned hash -> fraction of the 64-bit line in [0, 1). */
  private def frac(u: Long): Double = (u >>> 11).toDouble / (1L << 53).toDouble

  /** Distinct estimate: exact below capacity, (k-1)/theta once full. The
    * empty guard comes FIRST: an UNSET merge buffer (k=0 — graft_kmv_merge
    * over an empty or all-NULL group) has size 0 and k 0, so the `< k`
    * test alone would fall through to `set.last()` on an empty set.
    */
  def estimate(st: State): Double =
    if (st.set.isEmpty) 0.0
    else if (st.set.size() < st.k) st.set.size().toDouble
    else (st.k - 1).toDouble / math.max(frac(st.set.last()), Double.MinPositiveValue)

  def toBytes(st: State): Array[Byte] = {
    val size = st.set.size()
    val bb = java.nio.ByteBuffer.allocate(2 + 4 + 4 + 8 * size)
    bb.put(Magic).put(Version).putInt(st.k).putInt(size)
    val it = st.set.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  def fromBytes(bytes: Array[Byte]): State = {
    require(bytes.length >= 10, s"not a graft kmv sketch (${bytes.length} bytes)")
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val (magic, version) = (bb.get(), bb.get())
    require(magic == Magic && version == Version,
      s"not a graft kmv sketch (magic=$magic version=$version)")
    val k = bb.getInt()
    val size = bb.getInt()
    require((k >= 16 && k <= (1 << 22)) || (k == 0 && size == 0),
      s"kmv sketch with implausible k=$k")
    require(size >= 0 && size <= math.max(k, 0) &&
      bytes.length == 2 + 4 + 4 + 8 * size,
      s"kmv length mismatch: ${bytes.length} bytes for $size hashes (k=$k)")
    val st = new State(new java.util.TreeSet[java.lang.Long](UnsignedOrder),
      if (k == 0) 0 else k)
    var i = 0
    while (i < size) { st.set.add(bb.getLong()); i += 1 }
    st
  }

  def statsBytes(bytes: Array[Byte]): Array[Double] = {
    val st = fromBytes(bytes)
    Array(estimate(st), st.set.size().toDouble, st.k.toDouble)
  }

  /** Theta-cut set algebra over two sketches:
    * [est_a, est_b, est_intersection, est_union, jaccard].
    */
  def overlapBytes(a: Array[Byte], b: Array[Byte]): Array[Double] = {
    val sa = fromBytes(a)
    val sb = fromBytes(b)
    def theta(st: State): Double =
      if (st.set.isEmpty || st.set.size() < st.k) 1.0 else frac(st.set.last())
    val th = math.min(theta(sa), theta(sb))
    // samples strictly below the shared theta cut (when theta == 1.0 the
    // whole set qualifies — both sketches are exact)
    def cut(st: State): java.util.TreeSet[java.lang.Long] =
      if (th >= 1.0) st.set
      else {
        val out = new java.util.TreeSet[java.lang.Long](UnsignedOrder)
        val it = st.set.iterator()
        var go = true
        while (go && it.hasNext) {
          val h = it.next()
          if (frac(h) < th) { out.add(h); () } else go = false
        }
        out
      }
    val ca = cut(sa)
    val cb = cut(sb)
    var inter = 0L
    val it = ca.iterator()
    while (it.hasNext) if (cb.contains(it.next())) inter += 1
    val union = ca.size().toLong + cb.size().toLong - inter
    val estInter = inter.toDouble / th
    val estUnion = union.toDouble / th
    Array(estimate(sa), estimate(sb), estInter, estUnion,
      if (union == 0L) 0.0 else inter.toDouble / union.toDouble)
  }
}

/** Shared shell for the two kmv aggregates. */
abstract class KmvAggBase extends TypedImperativeAggregate[KmvSketch.State] {
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def merge(buf: KmvSketch.State,
      other: KmvSketch.State): KmvSketch.State = {
    KmvSketch.mergeInto(buf, other); buf
  }
  override def eval(buf: KmvSketch.State): Any = KmvSketch.toBytes(buf)
  override def serialize(buf: KmvSketch.State): Array[Byte] =
    KmvSketch.toBytes(buf)
  override def deserialize(bytes: Array[Byte]): KmvSketch.State =
    KmvSketch.fromBytes(bytes)
}

/** graft_kmv(key bigint[, k]) -> binary sketch */
case class KmvBuild(child: Expression, k: Int = KmvSketch.K,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends KmvAggBase {

  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "graft_kmv"
  override def createAggregationBuffer(): KmvSketch.State = KmvSketch.empty(k)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType) TypeCheckResult.TypeCheckFailure(
      s"$prettyName takes a bigint key, got ${child.dataType.catalogString}")
    else if (k < 16 || k > (1 << 22)) TypeCheckResult.TypeCheckFailure(
      s"$prettyName capacity k=$k out of range [16, 4194304]")
    else TypeCheckResult.TypeCheckSuccess

  override def update(buf: KmvSketch.State,
      input: InternalRow): KmvSketch.State = {
    val v = child.eval(input)
    if (v != null) KmvSketch.add(buf, v.asInstanceOf[Long])
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvBuild =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvBuild =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvBuild =
    copy(child = newChildren(0))
}

/** graft_kmv_merge(sketch binary) -> binary sketch (stored-sketch union) */
case class KmvMerge(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends KmvAggBase {

  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "graft_kmv_merge"
  override def createAggregationBuffer(): KmvSketch.State = KmvSketch.unset

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName takes a binary sketch column, got ${child.dataType.catalogString}")

  override def update(buf: KmvSketch.State,
      input: InternalRow): KmvSketch.State = {
    val v = child.eval(input)
    if (v != null) KmvSketch.mergeInto(buf,
      KmvSketch.fromBytes(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvMerge =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvMerge =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvMerge =
    copy(child = newChildren(0))
}

/** graft_kmv_stats(sketch) -> array<double> [estimate, size, k] */
case class KmvStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_kmv_stats"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName takes a binary sketch, got ${child.dataType.catalogString}")

  override def nullSafeEval(sketch: Any): Any =
    new GenericArrayData(
      KmvSketch.statsBytes(sketch.asInstanceOf[Array[Byte]]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.KmvSketch.statsBytes($s));")

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

/** graft_kmv_overlap(sk1, sk2) -> array<double>
  * [est_a, est_b, est_intersection, est_union, jaccard] — the two-sketch
  * theta-cut set algebra.
  */
case class KmvOverlap(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_kmv_overlap"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName takes two binary sketches, got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override def nullSafeEval(a: Any, b: Any): Any =
    new GenericArrayData(KmvSketch.overlapBytes(
      a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.KmvSketch.overlapBytes($a, $b));")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression) =
    copy(left = newLeft, right = newRight)
}
