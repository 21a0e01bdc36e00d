package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Mergeable count-min sketches with USER-VISIBLE state (Cormode &
  * Muthukrishnan 2005) — per-key frequency estimation in one pass, the
  * third member of the stored-sketch-rollup family next to the HLL
  * (distinct counts) and the quantile digest (rank statistics): write one
  * sketch per day/partition/source, later union + merge and answer "how
  * often did key k occur" over any combination of stored rollups without
  * rescanning raw data.
  *
  * - graft_cms(hash bigint)          -> binary   (aggregate: build)
  * - graft_cms_merge(sketch binary)  -> binary   (aggregate: union stored)
  * - graft_cms_query(sketch, hash)   -> bigint   (scalar: point estimate)
  *
  * d=4 rows x w=2048 counters (64 KB per sketch). Counter update is +=,
  * so merge is elementwise ADD — associative and commutative, hence
  * merged-of-stored is BIT-IDENTICAL to direct-over-raw (the exact gate
  * x_cms_rollup pins, same invariant as the HLL register max). The
  * estimate min_i C[i][h_i(k)] is one-sided: NEVER below the true count
  * (every occurrence of k lands in all d of its counters), and above it
  * by more than (e/w)*N with probability <= e^-d ~ 1.8% per row queried
  * (N = total increments). Row hashes derive from the caller's 64-bit
  * key hash via a per-row fmix64 remix, so callers pass xxhash64(col)
  * exactly as for graft_hll.
  *
  * Wire format is self-describing (the r8 QuantileSketch lesson): magic
  * 'M', version 1, w, d, then d*w big-endian longs — deserialize
  * validates magic/version/shape/length instead of trusting the caller.
  */
object CountMin {
  val W = 2048
  val D = 4
  val Magic: Byte = 'M'
  val Version: Byte = 1

  def emptySketch: Array[Long] = new Array[Long](D * W)

  /** fmix64 finalizer (MurmurHash3) over the key hash XOR a per-row salt:
    * d independent-enough row hashes from one 64-bit input.
    */
  private def rowIndex(hash: Long, row: Int): Int = {
    var h = hash ^ (0x9e3779b97f4a7c15L * (row + 1))
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33
    ((h >>> 1) % W).toInt
  }

  def add(buf: Array[Long], hash: Long, inc: Long): Unit = {
    var r = 0
    while (r < D) { buf(r * W + rowIndex(hash, r)) += inc; r += 1 }
  }

  def mergeInto(into: Array[Long], from: Array[Long]): Unit = {
    var i = 0
    while (i < into.length) { into(i) += from(i); i += 1 }
  }

  def query(buf: Array[Long], hash: Long): Long = {
    var est = Long.MaxValue
    var r = 0
    while (r < D) {
      val c = buf(r * W + rowIndex(hash, r))
      if (c < est) est = c
      r += 1
    }
    est
  }

  def toBytes(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(2 + 8 + 8 * buf.length)
    bb.put(Magic).put(Version).putInt(W).putInt(D)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  def fromBytes(bytes: Array[Byte]): Array[Long] = {
    require(bytes.length >= 10, s"not a graft cms sketch (${bytes.length} bytes)")
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val (magic, version) = (bb.get(), bb.get())
    require(magic == Magic && version == Version,
      s"not a graft cms sketch (magic=$magic version=$version)")
    val (w, d) = (bb.getInt(), bb.getInt())
    require(w == W && d == D,
      s"cms shape mismatch: stored ${d}x$w, reader ${D}x$W — estimates would " +
        "silently change error bounds")
    require(bytes.length == 2 + 8 + 8 * d * w,
      s"cms length mismatch: ${bytes.length} bytes for ${d}x$w")
    val out = new Array[Long](d * w)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong(); i += 1 }
    out
  }

  def queryBytes(bytes: Array[Byte], hash: Long): Long =
    query(fromBytes(bytes), hash)
}

/** Shared shell for the two cms aggregates: buffer is the raw counter
  * matrix; the user-visible value is the self-describing byte form.
  */
abstract class CmsAggBase extends TypedImperativeAggregate[Array[Long]] {
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def createAggregationBuffer(): Array[Long] = CountMin.emptySketch
  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    CountMin.mergeInto(buf, other); buf
  }
  override def eval(buf: Array[Long]): Any = CountMin.toBytes(buf)
  override def serialize(buf: Array[Long]): Array[Byte] = CountMin.toBytes(buf)
  override def deserialize(bytes: Array[Byte]): Array[Long] =
    CountMin.fromBytes(bytes)
}

/** graft_cms(hash bigint) -> binary sketch */
case class CmsBuild(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends CmsAggBase {

  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "graft_cms"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName takes a bigint hash (pass xxhash64(col)), got ${child.dataType.catalogString}")

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) CountMin.add(buf, v.asInstanceOf[Long], 1L)
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsBuild =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsBuild =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmsBuild =
    copy(child = newChildren(0))
}

/** graft_cms_merge(sketch binary) -> binary sketch */
case class CmsMerge(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends CmsAggBase {

  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "graft_cms_merge"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName takes a binary sketch column, got ${child.dataType.catalogString}")

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) CountMin.mergeInto(buf,
      CountMin.fromBytes(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsMerge =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsMerge =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmsMerge =
    copy(child = newChildren(0))
}

/** graft_cms_query(sketch binary, hash bigint) -> bigint point estimate */
case class CmsQuery(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_cms_query"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName takes (binary sketch, bigint hash), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override def nullSafeEval(sketch: Any, hash: Any): Any =
    CountMin.queryBytes(sketch.asInstanceOf[Array[Byte]],
      hash.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, h) =>
      s"${ev.value} = graft.functions.CountMin.queryBytes($s, $h);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression) =
    copy(left = newLeft, right = newRight)
}
