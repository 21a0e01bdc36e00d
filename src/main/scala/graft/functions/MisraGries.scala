package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mergeable Misra-Gries heavy-hitters summaries with USER-VISIBLE state
  * (Misra & Gries 1982; mergeability per Agarwal et al., "Mergeable
  * Summaries", PODS'12) — the fourth member of the stored-sketch-rollup
  * family: HLL = distinct counts, quantile digest = ranks, count-min =
  * per-key frequency, Misra-Gries = WHICH keys are frequent. Write one
  * summary per day/partition/source, later union + merge and answer
  * "what are the heavy keys and how often" without rescanning raw data.
  *
  * - graft_mg(key bigint[, k])       -> binary  (aggregate: build, default K=64)
  * - graft_mg_merge(sketch binary)   -> binary  (aggregate: union stored)
  * - graft_mg_query(sketch, key)     -> bigint  (scalar: count estimate)
  * - graft_mg_stats(sketch)          -> array<bigint> [n, m, k]
  *
  * Invariants (DETERMINISTIC, not probabilistic — unlike CMS there is no
  * failure probability to budget):
  *  - est(key) <= true count, always (counts are only ever decremented).
  *  - true - est <= (N - M)/(K+1), where N = total increments the summary
  *    has absorbed and M = sum of retained counts: each decrement step
  *    removes K+1 from the pool, so there were at most (N-M)/(K+1) of
  *    them, and a key loses at most one per step. The PODS'12 result is
  *    that pointwise-add-then-reduce MERGE preserves exactly this
  *    invariant, so the bound read off the final merged state holds no
  *    matter how the build was partitioned.
  *  - hence every key with true count > (N - M)/(K+1) is PRESENT.
  *
  * Unlike CMS/HLL the state is NOT order-insensitive (two build orders
  * may retain different light keys), so rollup gates pin the invariants
  * above, never byte equality, and query outputs must not expose raw
  * estimates as oracle values.
  *
  * Wire format is self-describing: magic 'G', version 1, k, n, size,
  * then size x (key, count) longs — deserialize validates
  * magic/version/shape/length instead of trusting the caller.
  */
object MisraGries {
  /** Default counter budget; callers may size K per call — the wire format
    * carries the writer's K and merge REFUSES mixed-K inputs (a silent mix
    * would silently change every bound).
    */
  val K = 64
  val Magic: Byte = 'G'
  val Version: Byte = 1

  /** Mutable summary state: tracked counters + total increments absorbed.
    * k == 0 marks an UNSET merge buffer (adopts the first input's K).
    */
  final class State(val map: java.util.HashMap[java.lang.Long, java.lang.Long],
      var n: Long, var k: Int) {
    def m: Long = {
      var s = 0L
      val it = map.values().iterator()
      while (it.hasNext) s += it.next()
      s
    }
  }

  def empty: State = empty(K)
  def empty(k: Int): State = new State(new java.util.HashMap(), 0L, k)
  private[functions] def unset: State = new State(new java.util.HashMap(), 0L, 0)

  def add(st: State, key: Long): Unit = {
    require(st.k >= 1, "cannot add to an unset merge buffer")
    st.n += 1
    val cur = st.map.get(key)
    if (cur != null) st.map.put(key, cur + 1L)
    else if (st.map.size() < st.k) st.map.put(key, 1L)
    else {
      // decrement-all step: removes K+1 from the pool (K stored + this
      // arrival), amortized O(1) per increment over the whole stream
      val it = st.map.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
      }
    }
  }

  /** Pointwise add, then reduce back to K counters by subtracting the
    * (K+1)-th largest count from every counter (Agarwal et al.) — a
    * VALUE, so count ties need no tiebreak.
    */
  def mergeInto(into: State, from: State): Unit = {
    if (from.k == 0) return // empty unset buffer contributes nothing
    if (into.k == 0) into.k = from.k // adopt the first input's K
    require(into.k == from.k,
      s"mg K mismatch in merge: ${into.k} vs ${from.k} — mixing budgets " +
        "silently changes the (N-M)/(K+1) bound")
    into.n += from.n
    val it = from.map.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = into.map.get(e.getKey)
      into.map.put(e.getKey, if (cur == null) e.getValue else cur + e.getValue)
    }
    if (into.map.size() > into.k) {
      val counts = new Array[Long](into.map.size())
      var i = 0
      val vit = into.map.values().iterator()
      while (vit.hasNext) { counts(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - into.k - 1) // (K+1)-th largest
      val eit = into.map.entrySet().iterator()
      while (eit.hasNext) {
        val e = eit.next()
        if (e.getValue <= cut) eit.remove() else e.setValue(e.getValue - cut)
      }
    }
  }

  def query(st: State, key: Long): Long = {
    val v = st.map.get(key)
    if (v == null) 0L else v.longValue()
  }

  def toBytes(st: State): Array[Byte] = {
    val size = st.map.size()
    val bb = java.nio.ByteBuffer.allocate(2 + 4 + 8 + 4 + 16 * size)
    bb.put(Magic).put(Version).putInt(st.k).putLong(st.n).putInt(size)
    // serialize in ascending key order: a canonical byte form for any
    // given counter set (HashMap iteration order must not leak into
    // stored artifacts)
    val keys = new Array[Long](size)
    var i = 0
    val kit = st.map.keySet().iterator()
    while (kit.hasNext) { keys(i) = kit.next(); i += 1 }
    java.util.Arrays.sort(keys)
    i = 0
    while (i < size) {
      bb.putLong(keys(i)).putLong(st.map.get(keys(i)))
      i += 1
    }
    bb.array()
  }

  def fromBytes(bytes: Array[Byte]): State = {
    require(bytes.length >= 18, s"not a graft mg summary (${bytes.length} bytes)")
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val (magic, version) = (bb.get(), bb.get())
    require(magic == Magic && version == Version,
      s"not a graft mg summary (magic=$magic version=$version)")
    val k = bb.getInt()
    val n = bb.getLong()
    val size = bb.getInt()
    require((k >= 1 && k <= 1000000) || (k == 0 && n == 0 && size == 0),
      s"mg summary with implausible K=$k")
    require(size >= 0 && size <= k &&
      bytes.length == 2 + 4 + 8 + 4 + 16 * size,
      s"mg length mismatch: ${bytes.length} bytes for $size counters (K=$k)")
    val st = new State(new java.util.HashMap(), n, k)
    var i = 0
    while (i < size) { st.map.put(bb.getLong(), bb.getLong()); i += 1 }
    st
  }

  def queryBytes(bytes: Array[Byte], key: Long): Long =
    query(fromBytes(bytes), key)

  def statsBytes(bytes: Array[Byte]): Array[Long] = {
    val st = fromBytes(bytes)
    Array(st.n, st.m, st.k.toLong)
  }
}

/** Shared shell for the two mg aggregates. */
abstract class MgAggBase extends TypedImperativeAggregate[MisraGries.State] {
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def merge(buf: MisraGries.State,
      other: MisraGries.State): MisraGries.State = {
    MisraGries.mergeInto(buf, other); buf
  }
  override def eval(buf: MisraGries.State): Any = MisraGries.toBytes(buf)
  override def serialize(buf: MisraGries.State): Array[Byte] =
    MisraGries.toBytes(buf)
  override def deserialize(bytes: Array[Byte]): MisraGries.State =
    MisraGries.fromBytes(bytes)
}

/** graft_mg(key bigint[, k]) -> binary summary */
case class MgBuild(child: Expression, k: Int = MisraGries.K,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends MgAggBase {

  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "graft_mg"
  override def createAggregationBuffer(): MisraGries.State =
    MisraGries.empty(k)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType) TypeCheckResult.TypeCheckFailure(
      s"$prettyName takes a bigint key, got ${child.dataType.catalogString}")
    else if (k < 1 || k > 1000000) TypeCheckResult.TypeCheckFailure(
      s"$prettyName counter budget k=$k out of range [1, 1e6]")
    else TypeCheckResult.TypeCheckSuccess

  override def update(buf: MisraGries.State,
      input: InternalRow): MisraGries.State = {
    val v = child.eval(input)
    if (v != null) MisraGries.add(buf, v.asInstanceOf[Long])
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MgBuild =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MgBuild =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MgBuild =
    copy(child = newChildren(0))
}

/** graft_mg_merge(sketch binary) -> binary summary */
case class MgMerge(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends MgAggBase {

  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "graft_mg_merge"
  // unset (k=0): adopts the K of the first stored summary it absorbs
  override def createAggregationBuffer(): MisraGries.State = MisraGries.unset

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName takes a binary summary column, got ${child.dataType.catalogString}")

  override def update(buf: MisraGries.State,
      input: InternalRow): MisraGries.State = {
    val v = child.eval(input)
    if (v != null) MisraGries.mergeInto(buf,
      MisraGries.fromBytes(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MgMerge =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MgMerge =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MgMerge =
    copy(child = newChildren(0))
}

/** graft_mg_query(sketch binary, key bigint) -> bigint estimate (0 when the
  * key is not tracked — by the MG invariant that alone bounds its true
  * count by (N-M)/(K+1)).
  */
case class MgQuery(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_mg_query"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName takes (binary summary, bigint key), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override def nullSafeEval(sketch: Any, key: Any): Any =
    MisraGries.queryBytes(sketch.asInstanceOf[Array[Byte]],
      key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, h) =>
      s"${ev.value} = graft.functions.MisraGries.queryBytes($s, $h);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression) =
    copy(left = newLeft, right = newRight)
}

/** graft_mg_stats(sketch binary) -> array<bigint> [n, m, k]: the inputs of
  * the deterministic error bound (N - M)/(K+1), read off the summary so
  * gates can state it without a side channel.
  */
case class MgStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_mg_stats"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName takes a binary summary, got ${child.dataType.catalogString}")

  override def nullSafeEval(sketch: Any): Any =
    new GenericArrayData(
      MisraGries.statsBytes(sketch.asInstanceOf[Array[Byte]]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.MisraGries.statsBytes($s));")

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}
