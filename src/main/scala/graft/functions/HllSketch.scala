package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Mergeable HyperLogLog sketches with USER-VISIBLE state (Flajolet et al.
  * 2007) — the re-aggregation pattern `approx_count_distinct` can't do:
  * its sketch lives only inside one aggregation. Here the sketch is a
  * binary column a pipeline can WRITE (one per day/partition/source),
  * then later union and merge — count distinct over any combination of
  * stored rollups without rescanning the raw data, which at 100 TB is
  * the whole point of a sketch rollup table.
  *
  * - graft_hll(hash bigint)           -> binary   (aggregate: build)
  * - graft_hll_merge(sketch binary)   -> binary   (aggregate: union stored sketches)
  * - graft_hll_card(sketch binary)    -> bigint   (scalar: estimate)
  *
  * p = 12 => 4096 one-byte registers (4 KB per sketch), rsd ~1.04/64 =
  * 1.6%. Register update is max(), so merge is associative/commutative
  * and merged-then-estimated is BIT-IDENTICAL to direct-estimated — the
  * invariant the x_hll_rollup oracle pins exactly, with accuracy vs the
  * true count gated separately. Estimator: raw alpha*m^2/sum(2^-M[j])
  * with the standard small-range linear-counting correction; estimates
  * round to long.
  *
  * Callers pass xxhash64(col) — 64 bits: top 12 index the register, the
  * remaining 52 feed the leading-zero rank (max rho 53 < 255, one byte).
  */
object HllSketch {
  val P = 12
  val M = 1 << P // 4096 registers

  def emptySketch: Array[Byte] = new Array[Byte](M)

  def addHash(reg: Array[Byte], hash: Long): Unit = {
    val idx = (hash >>> (64 - P)).toInt
    val rest = hash << P
    // rho = leading zeros of the remaining 52-bit pattern + 1; a rest of
    // exactly 0 gets the max rank 64-P+1
    val rho = (if (rest == 0L) 64 - P else java.lang.Long.numberOfLeadingZeros(rest)) + 1
    if (rho > (reg(idx) & 0xff)) reg(idx) = rho.toByte
  }

  def mergeInto(into: Array[Byte], from: Array[Byte]): Unit = {
    var i = 0
    while (i < M) {
      if ((from(i) & 0xff) > (into(i) & 0xff)) into(i) = from(i)
      i += 1
    }
  }

  /** Flajolet et al. estimator with linear-counting small-range correction. */
  def cardinality(reg: Array[Byte]): Long = {
    val alpha = 0.7213 / (1.0 + 1.079 / M)
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < M) {
      val r = reg(i) & 0xff
      sum += java.lang.Math.scalb(1.0, -r) // 2^-r
      if (r == 0) zeros += 1
      i += 1
    }
    val e = alpha * M.toDouble * M.toDouble / sum
    val est =
      if (e <= 2.5 * M && zeros > 0) M * math.log(M.toDouble / zeros)
      else e
    math.rint(est).toLong
  }
}

/** Shared shell for the two sketch aggregates (build-from-hashes and
  * merge-stored-sketches): buffer is the raw register array.
  */
abstract class HllAggBase extends TypedImperativeAggregate[Array[Byte]] {
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def createAggregationBuffer(): Array[Byte] = HllSketch.emptySketch
  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    HllSketch.mergeInto(buf, other); buf
  }
  override def eval(buf: Array[Byte]): Any = buf
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes.clone()
}

/** graft_hll(hash bigint) -> binary sketch */
case class HllBuild(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends HllAggBase {

  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "graft_hll"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName takes a bigint hash (pass xxhash64(col)), got ${child.dataType.catalogString}")

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) HllSketch.addHash(buf, v.asInstanceOf[Long])
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HllBuild =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllBuild =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllBuild =
    copy(child = newChildren(0))
}

/** graft_hll_merge(sketch binary) -> binary sketch */
case class HllMerge(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends HllAggBase {

  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "graft_hll_merge"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName takes a binary sketch column, got ${child.dataType.catalogString}")

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val bytes = v.asInstanceOf[Array[Byte]]
      require(bytes.length == HllSketch.M,
        s"$prettyName: sketch must be ${HllSketch.M} bytes, got ${bytes.length}")
      HllSketch.mergeInto(buf, bytes)
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HllMerge =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllMerge =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllMerge =
    copy(child = newChildren(0))
}

/** graft_hll_card(sketch binary) -> bigint estimate */
case class HllCardinality(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hll_card"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName takes a binary sketch column, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    HllSketch.cardinality(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = graft.functions.HllSketch.cardinality($c);")

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}
