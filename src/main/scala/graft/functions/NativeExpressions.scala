package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector/sketch kernels (VectorOps).
  *
  * Each participates in whole-stage codegen via a static call into the
  * JIT'd kernel — one virtual call per row instead of Catalyst's interpreted
  * per-element higher-order-function evaluation. Registered by
  * GraftFunctions.register / GraftExtensions.
  */

private object NativeExprs {
  val Ops = "graft.functions.VectorOps"

  def isDoubleArray(t: DataType): Boolean = t match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }
  def isLongArray(t: DataType): Boolean = t match {
    case ArrayType(LongType, _) => true
    case _ => false
  }
  def isStringArray(t: DataType): Boolean = t match {
    case ArrayType(_: StringType, _) => true
    case _ => false
  }
}

/** cosine(array<double>, array<double>) -> double */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {
  import NativeExprs._

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  override def checkInputDataTypes(): TypeCheckResult =
    if (isDoubleArray(left.dataType) && isDoubleArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<double>, array<double>), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $Ops.cosine($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** graft_sorted_intersect(array<bigint>, array<bigint>) -> int — the size
  * of the intersection of two ASCENDING-sorted long arrays via one linear
  * merge pass: no per-row hash-set build (array_intersect's cost shape),
  * no allocation. The ppjoin verify kernel: candidates' gid sets are
  * sorted once per document, then every candidate pair intersects in
  * O(|x|+|y|) long comparisons. Caller contract: both arrays sorted
  * ascending, no duplicates (sets); unsorted input silently undercounts —
  * this is a kernel, not a validator.
  */
case class SortedLongIntersect(left: Expression, right: Expression)
    extends BinaryExpression {
  import NativeExprs._

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_sorted_intersect"

  override def checkInputDataTypes(): TypeCheckResult =
    if (isLongArray(left.dataType) && isLongArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<bigint>, array<bigint>), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.sortedIntersectCount(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      (a, b) => s"${ev.value} = $Ops.sortedIntersectCount($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** graft_minhash(array<string>, numHashes) -> array<bigint> */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {
  import NativeExprs._

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  override def checkInputDataTypes(): TypeCheckResult =
    if (isStringArray(child.dataType) && numHashes > 0) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> and numHashes > 0")

  override def nullSafeEval(input: Any): Any =
    VectorOps.minhashSig(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = $Ops.minhashSig($c, $numHashes);")

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

/** graft_simhash(array<bigint> token hashes) -> bigint */
case class SimHash64(child: Expression) extends UnaryExpression {
  import NativeExprs._

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def checkInputDataTypes(): TypeCheckResult =
    if (isLongArray(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<bigint>")

  override def nullSafeEval(input: Any): Any =
    VectorOps.simhash64(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $Ops.simhash64($c);")

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

/** graft_shingles(array<string> tokens, k) -> array<string> distinct k-shingles */
case class ShingleSet(child: Expression, k: Int) extends UnaryExpression {
  import NativeExprs._

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override def checkInputDataTypes(): TypeCheckResult =
    if (isStringArray(child.dataType) && k > 0) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<string> and k > 0")

  override def nullSafeEval(input: Any): Any =
    VectorOps.shingleSet(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $Ops.shingleSet($c, $k);")

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

/** graft_nearest_centroid(array<double>, array<array<double>>) -> int
  * 0-based index of the max-cosine centroid (ties -> lowest index). The
  * centroid matrix is normally a foldable literal (nlist x dim), so codegen
  * reads it from the references array — the assignment stays a narrow,
  * whole-stage-codegen'd projection.
  */
case class NearestCentroid(left: Expression, right: Expression)
    extends BinaryExpression {
  import NativeExprs._

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_nearest_centroid"

  override def checkInputDataTypes(): TypeCheckResult = right.dataType match {
    case ArrayType(inner, _) if isDoubleArray(left.dataType) && isDoubleArray(inner) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<double>, array<array<double>>), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.nearestCentroid(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $Ops.nearestCentroid($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** graft_nearest2_centroids(array<double>, array<array<double>>)
  * -> array<int> of the two max-cosine centroid indices, best first (see
  * VectorOps.nearest2Centroids — the multi-assignment boundary fix for
  * cluster-bucketed semantic dedup). Same foldable-literal codegen shape
  * as NearestCentroid.
  */
case class Nearest2Centroids(left: Expression, right: Expression)
    extends BinaryExpression {
  import NativeExprs._

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_nearest2_centroids"

  override def checkInputDataTypes(): TypeCheckResult = right.dataType match {
    case ArrayType(inner, _) if isDoubleArray(left.dataType) && isDoubleArray(inner) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<double>, array<array<double>>), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.nearest2Centroids(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $Ops.nearest2Centroids($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** graft_nearest_centroid_l2(array<double>, array<array<double>>) -> int
  * 0-based index of the min-squared-L2 centroid (ties -> lowest index) —
  * the PQ-codebook assignment metric (Jégou TPAMI'11 fits each subspace's
  * k-means in L2; cosine would discard subvector magnitude). Same
  * foldable-literal codegen shape as NearestCentroid.
  */
case class NearestCentroidL2(left: Expression, right: Expression)
    extends BinaryExpression {
  import NativeExprs._

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_nearest_centroid_l2"

  override def checkInputDataTypes(): TypeCheckResult = right.dataType match {
    case ArrayType(inner, _) if isDoubleArray(left.dataType) && isDoubleArray(inner) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<double>, array<array<double>>), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.nearestCentroidL2(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $Ops.nearestCentroidL2($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** graft_hyperplanes(array<double>, numPlanes, numTables) -> array<bigint>
  * of numTables independent LSH signatures (OR-amplification; element 0
  * equals graft_hyperplane's single signature).
  */
case class HyperplaneSignatures(child: Expression, numPlanes: Int, numTables: Int)
    extends UnaryExpression {
  import NativeExprs._

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_hyperplanes"

  override def checkInputDataTypes(): TypeCheckResult =
    if (isDoubleArray(child.dataType) && numPlanes > 0 && numPlanes <= 63 && numTables > 0)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, 0 < numPlanes <= 63, numTables > 0")

  override def nullSafeEval(input: Any): Any =
    VectorOps.hyperplaneSigs(input.asInstanceOf[ArrayData], numPlanes, numTables)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = $Ops.hyperplaneSigs($c, $numPlanes, $numTables);")

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

/** graft_hyperplane_probes(array<double>, numPlanes, numTables, nProbes)
  * -> array<bigint> of numTables*nProbes multi-probe bucket keys,
  * table-major (see VectorOps.hyperplaneProbes — Lv et al. VLDB'07).
  * Query-side companion of graft_hyperplanes: element t*nProbes equals
  * hyperplanes' element t, the rest are that table's cheapest margin
  * perturbations.
  */
case class HyperplaneProbes(child: Expression, numPlanes: Int, numTables: Int,
    nProbes: Int) extends UnaryExpression {
  import NativeExprs._

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_hyperplane_probes"

  override def checkInputDataTypes(): TypeCheckResult =
    if (isDoubleArray(child.dataType) && numPlanes > 0 && numPlanes <= 63 &&
      numTables > 0 && nProbes > 0)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, 0 < numPlanes <= 63, " +
        "numTables > 0, nProbes > 0")

  override def nullSafeEval(input: Any): Any =
    VectorOps.hyperplaneProbes(input.asInstanceOf[ArrayData], numPlanes,
      numTables, nProbes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = $Ops.hyperplaneProbes($c, $numPlanes, $numTables, $nProbes);")

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

/** graft_project(array<double>, outDim) -> array<double> — deterministic
  * JL random projection (see VectorOps.project).
  */
case class RandomProjection(child: Expression, outDim: Int)
    extends UnaryExpression {
  import NativeExprs._

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_project"

  override def checkInputDataTypes(): TypeCheckResult =
    if (isDoubleArray(child.dataType) && outDim > 0) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double> and outDim > 0")

  override def nullSafeEval(input: Any): Any =
    VectorOps.project(input.asInstanceOf[ArrayData], outDim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $Ops.project($c, $outDim);")

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

/** graft_hyperplane(array<double>, numPlanes) -> bigint bucket id */
case class HyperplaneSignature(child: Expression, numPlanes: Int)
    extends UnaryExpression {
  import NativeExprs._

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hyperplane"

  override def checkInputDataTypes(): TypeCheckResult =
    if (isDoubleArray(child.dataType) && numPlanes > 0 && numPlanes <= 63)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double> and 0 < numPlanes <= 63")

  override def nullSafeEval(input: Any): Any =
    VectorOps.hyperplaneSig(input.asInstanceOf[ArrayData], numPlanes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = $Ops.hyperplaneSig($c, $numPlanes);")

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}
