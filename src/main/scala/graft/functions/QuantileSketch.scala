package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Fixed-size mergeable quantile sketch:
  * graft_qsketch(value double, k int, ps array<double>) -> array<double>
  * (one estimate per requested quantile, in request order).
  *
  * The grouped-percentile path for HIGH-cardinality keys — the regime
  * `operators.Percentiles.exact` deliberately refuses (its driver-side
  * rank locator holds O(groups × buckets) state). This sketch is a
  * t-digest-style centroid summary with a uniform weight cap: the buffer
  * holds ≤ k (value, weight) centroids plus a small unsorted intake; at
  * compression, centroids are rebuilt greedily left-to-right with weight
  * cap ceil(total/k). It participates in partial aggregation
  * (ObjectHashAggregate), so a million-group aggregate carries k doubles
  * per group through the exchange and NOTHING to the driver — the shape
  * a 100 TB grouped quantile needs.
  *
  * Accuracy: a centroid spans ≤ ceil(total/k)+max_input_weight ranks, so a
  * quantile estimate's true rank is within ~2/k of the target (heavy
  * duplicates sit in their own exact-valued centroid and cost nothing).
  * Merge order across partitions shifts WHICH ranks the centroids cut at
  * — estimates vary inside the bound but never outside it, which is what
  * the error-gated queries/specs assert.
  *
  * Reference analogue: vega has no quantile machinery at all (SURVEY
  * §2.9); this extends the approx family (count_approx etc.,
  * src/partial/) to rank statistics.
  */
case class QuantileSketch(
    valueExpr: Expression,
    kExpr: Expression,
    psExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantileSketch.Buffer] {

  import QuantileSketch.Buffer

  private lazy val k: Int = GraftFunctions.intArg(kExpr)
  private lazy val ps: Array[Double] = {
    val arr = psExpr.eval().asInstanceOf[ArrayData]
    arr.toDoubleArray()
  }

  override def children: Seq[Expression] = Seq(valueExpr, kExpr, psExpr)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_qsketch"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (valueExpr.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a double value column, got ${valueExpr.dataType.catalogString}")
    else if (!kExpr.foldable || !psExpr.foldable)
      TypeCheckResult.TypeCheckFailure(s"$prettyName k and quantiles must be literals")
    // type guards BEFORE touching the lazy k/ps vals: SQL spells like
    // array(0.5, 0.9) parse as DECIMAL literals, and evaluating them
    // through toDoubleArray would throw a raw ClassCastException out of
    // analysis instead of this readable failure
    else if (!Seq[DataType](ByteType, ShortType, IntegerType, LongType)
        .contains(kExpr.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName k must be an integer literal, got ${kExpr.dataType.catalogString}")
    else if (!(psExpr.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName quantiles must be array<double> (write 0.5D, not 0.5 — " +
          s"bare decimals parse as DECIMAL), got ${psExpr.dataType.catalogString}")
    else if (k < 16)
      TypeCheckResult.TypeCheckFailure(s"$prettyName needs k >= 16, got $k")
    // NaN comparisons are all false, so `p < 0 || p > 1` alone lets NaN
    // through — and quantile(NaN) would fall off the rank loop and
    // silently return the max
    else if (ps.isEmpty || ps.exists(p => p.isNaN || p < 0.0 || p > 1.0))
      TypeCheckResult.TypeCheckFailure(s"$prettyName quantiles must be in [0, 1]")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): Buffer = new Buffer(k)

  override def update(buf: Buffer, input: InternalRow): Buffer = {
    val v = valueExpr.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Double], 1.0)
    buf
  }

  override def merge(buf: Buffer, other: Buffer): Buffer = { buf.absorb(other); buf }

  override def eval(buf: Buffer): Any =
    new GenericArrayData(ps.map(buf.quantile))

  override def serialize(buf: Buffer): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): Buffer = Buffer.fromBytes(k, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): QuantileSketch =
    copy(valueExpr = newChildren(0), kExpr = newChildren(1), psExpr = newChildren(2))
}

/** graft_qsketch_state(value double, k int) -> binary — the SAME centroid
  * summary as graft_qsketch, but eval returns the serialized sketch
  * instead of quantile estimates: the storable half of a quantile rollup
  * table (one digest per day/source/partition, written to parquet).
  * Pairs with graft_qsketch_merged, which re-aggregates stored digests —
  * together the rank-statistics twin of the graft_hll/graft_hll_merge
  * pattern.
  */
case class QuantileSketchState(
    valueExpr: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantileSketch.Buffer] {

  import QuantileSketch.Buffer

  private lazy val k: Int = GraftFunctions.intArg(kExpr)

  override def children: Seq[Expression] = Seq(valueExpr, kExpr)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_qsketch_state"
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    if (valueExpr.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a double value column, got ${valueExpr.dataType.catalogString}")
    else if (!kExpr.foldable ||
      !Seq[DataType](ByteType, ShortType, IntegerType, LongType).contains(kExpr.dataType))
      TypeCheckResult.TypeCheckFailure(s"$prettyName k must be an integer literal")
    else if (k < 16)
      TypeCheckResult.TypeCheckFailure(s"$prettyName needs k >= 16, got $k")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): Buffer = new Buffer(k)

  override def update(buf: Buffer, input: InternalRow): Buffer = {
    val v = valueExpr.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Double], 1.0)
    buf
  }

  override def merge(buf: Buffer, other: Buffer): Buffer = { buf.absorb(other); buf }
  override def eval(buf: Buffer): Any = buf.toBytes
  override def serialize(buf: Buffer): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): Buffer = Buffer.fromBytes(k, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketchState =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketchState =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): QuantileSketchState =
    copy(valueExpr = newChildren(0), kExpr = newChildren(1))
}

/** graft_qsketch_merged(state binary, k int, ps array<double>) ->
  * array<double> — merge STORED digests (from graft_qsketch_state) and
  * answer quantiles over their union, without rescanning the raw data.
  */
case class QuantileSketchMerged(
    stateExpr: Expression,
    kExpr: Expression,
    psExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantileSketch.Buffer] {

  import QuantileSketch.Buffer

  private lazy val k: Int = GraftFunctions.intArg(kExpr)
  private lazy val ps: Array[Double] =
    psExpr.eval().asInstanceOf[ArrayData].toDoubleArray()

  override def children: Seq[Expression] = Seq(stateExpr, kExpr, psExpr)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_qsketch_merged"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (stateExpr.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a binary digest column, got ${stateExpr.dataType.catalogString}")
    else if (!kExpr.foldable || !psExpr.foldable)
      TypeCheckResult.TypeCheckFailure(s"$prettyName k and quantiles must be literals")
    else if (!Seq[DataType](ByteType, ShortType, IntegerType, LongType)
        .contains(kExpr.dataType))
      TypeCheckResult.TypeCheckFailure(s"$prettyName k must be an integer literal")
    else if (!(psExpr.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName quantiles must be array<double> (write 0.5D)")
    else if (k < 16)
      TypeCheckResult.TypeCheckFailure(s"$prettyName needs k >= 16, got $k")
    else if (ps.isEmpty || ps.exists(p => p.isNaN || p < 0.0 || p > 1.0))
      TypeCheckResult.TypeCheckFailure(s"$prettyName quantiles must be in [0, 1]")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): Buffer = new Buffer(k)

  override def update(buf: Buffer, input: InternalRow): Buffer = {
    val v = stateExpr.eval(input)
    if (v != null) buf.absorb(Buffer.fromBytes(k, v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(buf: Buffer, other: Buffer): Buffer = { buf.absorb(other); buf }
  override def eval(buf: Buffer): Any = new GenericArrayData(ps.map(buf.quantile))
  override def serialize(buf: Buffer): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): Buffer = Buffer.fromBytes(k, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketchMerged =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketchMerged =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): QuantileSketchMerged =
    copy(stateExpr = newChildren(0), kExpr = newChildren(1), psExpr = newChildren(2))
}

object QuantileSketch {

  /** Centroid summary: sorted (value, weight) pairs ≤ k entries, plus an
    * unsorted intake of single values compressed in batches of 2k.
    */
  final class Buffer(val k: Int) {
    // parallel arrays, sorted by value after compress()
    private[QuantileSketch] var cVal = new Array[Double](0)
    private[QuantileSketch] var cW = new Array[Double](0)
    private val intake = new Array[Double](2 * k)
    private var intakeN = 0
    private[QuantileSketch] var total = 0.0

    def add(v: Double, w: Double): Unit = {
      if (w == 1.0 && intakeN < intake.length) {
        intake(intakeN) = v; intakeN += 1; total += 1.0
        if (intakeN == intake.length) compress(Array.empty, Array.empty)
      } else compress(Array(v), Array(w)) // compress re-derives total itself
    }

    def absorb(other: Buffer): Unit = {
      other.compress(Array.empty, Array.empty)
      compress(other.cVal, other.cW) // re-derives total from all weights
    }

    /** Rebuild centroids from (current centroids + intake + extra pairs),
      * greedy left-to-right with weight cap ceil(total/k). A single input
      * pair heavier than the cap keeps its own exact-valued centroid.
      */
    private def compress(xv: Array[Double], xw: Array[Double]): Unit = {
      val n = cVal.length + intakeN + xv.length
      if (n == 0) return
      val vs = new Array[Double](n)
      val ws = new Array[Double](n)
      System.arraycopy(cVal, 0, vs, 0, cVal.length)
      System.arraycopy(cW, 0, ws, 0, cVal.length)
      var i = 0
      while (i < intakeN) {
        vs(cVal.length + i) = intake(i); ws(cVal.length + i) = 1.0; i += 1
      }
      i = 0
      while (i < xv.length) {
        vs(cVal.length + intakeN + i) = xv(i)
        ws(cVal.length + intakeN + i) = xw(i)
        i += 1
      }
      intakeN = 0
      // sort pairs by value (indices sorted, then gather)
      val idx = Array.range(0, n).sortBy(vs)
      val tw = ws.sum
      total = tw // authoritative: includes weighted pairs
      val cap = math.max(1.0, math.ceil(tw / k))
      // sized n: every input pair opens at most one bucket, so overflow is
      // impossible by construction (adversarial heavy/light interleavings
      // can exceed k buckets, but never n; the summary stays ≤ ~2k because
      // n ≤ |centroids| + |intake| + |extra| ≤ 3k and re-compression with a
      // larger cap re-tightens it)
      val outV = new Array[Double](n)
      val outW = new Array[Double](n)
      var out = -1
      i = 0
      while (i < n) {
        val v = vs(idx(i)); val w = ws(idx(i))
        if (out >= 0 && outV(out) == v) {
          outW(out) += w // exact duplicates always merge, cap-exempt
        } else if (out >= 0 && outW(out) + w <= cap) {
          // weighted mean keeps the centroid inside its span
          val nw = outW(out) + w
          outV(out) = outV(out) + (v - outV(out)) * (w / nw)
          outW(out) = nw
        } else {
          out += 1
          outV(out) = v; outW(out) = w
        }
        i += 1
      }
      cVal = java.util.Arrays.copyOf(outV, out + 1)
      cW = java.util.Arrays.copyOf(outW, out + 1)
    }

    /** Rank-based quantile: centroid i's members occupy ranks
      * (cum, cum + w_i]; a target rank INSIDE a centroid returns its value
      * (a plateau — exact for merged duplicates, the heavy-centroid case
      * midpoint interpolation gets badly wrong), and a target in the unit
      * gap between centroid i's last member and centroid i+1's first
      * interpolates linearly. With all-unit weights this reproduces the
      * type-7 `lower + (upper - lower) * frac` percentile EXACTLY, so
      * groups smaller than k are answered exactly, not approximately.
      */
    def quantile(p: Double): Double = {
      compress(Array.empty, Array.empty)
      if (cVal.isEmpty) return Double.NaN
      if (cVal.length == 1) return cVal(0)
      val r = p * (total - 1.0) + 1.0 // 1-based target rank, type 7
      var cum = 0.0
      var i = 0
      while (i < cVal.length) {
        if (r <= cum + cW(i)) {
          return if (r >= cum + 1.0 || i == 0) cVal(i)
          else cVal(i - 1) + (cVal(i) - cVal(i - 1)) * (r - cum)
        }
        cum += cW(i)
        i += 1
      }
      cVal(cVal.length - 1)
    }

    /** Self-describing wire format: [magic 'Q'][version 1][k int][n int]
      * [n x (value double, weight double)]. The header carries the
      * writer's k because the 6/k rank bound only holds when every merged
      * digest was built at the READER's k — silently accepting a foreign
      * k would loosen the published error contract; and the magic/length
      * check turns a corrupt or non-digest binary into a clear error
      * instead of an unvalidated-length allocation (negative size / OOM).
      */
    def toBytes: Array[Byte] = {
      compress(Array.empty, Array.empty)
      val bb = ByteBuffer.allocate(10 + cVal.length * 16)
      bb.put(Buffer.Magic)
      bb.put(Buffer.Version)
      bb.putInt(k)
      bb.putInt(cVal.length)
      var i = 0
      while (i < cVal.length) { bb.putDouble(cVal(i)); bb.putDouble(cW(i)); i += 1 }
      bb.array()
    }
  }

  object Buffer {
    val Magic: Byte = 'Q'.toByte
    val Version: Byte = 1.toByte

    def fromBytes(k: Int, bytes: Array[Byte]): Buffer = {
      require(bytes.length >= 10,
        s"quantile digest too short (${bytes.length} bytes, need >= 10-byte header)")
      val bb = ByteBuffer.wrap(bytes)
      val magic = bb.get()
      val version = bb.get()
      require(magic == Magic && version == Version,
        s"not a graft quantile digest (magic=$magic version=$version)")
      val kw = bb.getInt
      require(kw == k,
        s"digest written with k=$kw cannot merge under reader k=$k " +
          "(the 6/k rank bound assumes writer k == reader k)")
      val n = bb.getInt
      require(n >= 0 && 10 + 16L * n == bytes.length,
        s"corrupt digest: header says $n centroids but payload is ${bytes.length} bytes")
      val vs = new Array[Double](n)
      val ws = new Array[Double](n)
      var i = 0
      var tw = 0.0
      while (i < n) { vs(i) = bb.getDouble; ws(i) = bb.getDouble; tw += ws(i); i += 1 }
      // restore arrays directly (serialized form is already sorted,
      // compressed centroids) — re-adding pair by pair would compress once
      // per centroid, O(k² log k) per deserialized partial
      val buf = new Buffer(k)
      buf.cVal = vs
      buf.cW = ws
      buf.total = tw
      buf
    }
  }
}
