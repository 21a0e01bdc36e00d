package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import scala.collection.mutable

/** Bounded-heap top-k as a partial-aggregable function:
  * graft_topk(id bigint, score double, k) -> array<struct<vid:bigint, sim:double>>
  * sorted best-first (score desc, id asc on ties).
  *
  * This is the scale-safe replacement for `Window.partitionBy(qid) +
  * row_number <= k` top-k: the window form shuffles EVERY scored candidate
  * row into one partition per query — with few queries that is a handful of
  * reducers holding the entire scored corpus. As a TypedImperativeAggregate
  * the heap participates in partial aggregation (ObjectHashAggregate): each
  * map task emits at most k rows per group, so the exchange carries
  * O(partitions * k) rows instead of O(corpus).
  *
  * Reference analogue: vega's bounded_priority_queue top-k
  * (utils/bounded_priority_queue.rs:8-58) — same algorithm, expressed as a
  * Catalyst aggregate so Catalyst plans the combine.
  */
case class TopKByScore(
    idExpr: Expression,
    scoreExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  override def children: Seq[Expression] = Seq(idExpr, scoreExpr)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_topk"

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("vid", LongType, nullable = false),
    StructField("sim", DoubleType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (idExpr.dataType == LongType && scoreExpr.dataType == DoubleType && k > 0)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (bigint, double) inputs and k > 0, got " +
        s"(${idExpr.dataType.catalogString}, ${scoreExpr.dataType.catalogString}), k=$k")

  // Heap dequeues its "maximum" = the WORST kept entry (lowest score; ties:
  // highest id), so eviction is O(log k) against the current cutoff.
  private val worstFirst: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
    override def compare(x: (Double, Long), y: (Double, Long)): Int = {
      val c = java.lang.Double.compare(y._1, x._1)
      if (c != 0) c else java.lang.Long.compare(x._2, y._2)
    }
  }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty[(Double, Long)](worstFirst)

  private def offer(buf: mutable.PriorityQueue[(Double, Long)], e: (Double, Long)): Unit = {
    if (buf.size < k) buf.enqueue(e)
    else if (worstFirst.lt(e, buf.head)) { buf.dequeue(); buf.enqueue(e) }
  }

  override def update(buf: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val id = idExpr.eval(input)
    val score = scoreExpr.eval(input)
    if (id != null && score != null) {
      offer(buf, (score.asInstanceOf[Double], id.asInstanceOf[Long]))
    }
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(Double, Long)],
      other: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    other.foreach(offer(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    // ascending under worstFirst = best (highest sim, lowest vid) first
    val sorted = buf.toArray.sorted(worstFirst)
    new GenericArrayData(sorted.map { case (sim, vid) =>
      new GenericInternalRow(Array[Any](vid, sim)): AnyRef
    })
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (s, v) => bb.putDouble(s); bb.putLong(v) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.enqueue((bb.getDouble, bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(idExpr = newChildren(0), scoreExpr = newChildren(1))
}
