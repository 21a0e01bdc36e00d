package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** FNV-1a rolling document fingerprint as a native Catalyst expression.
  *
  * Why an Expression and not a UDF: doGenCode keeps the hash inside
  * whole-stage codegen — no serialization boundary, no boxing, vectorized
  * over the scan batch — which is the difference between a fingerprint pass
  * being free vs dominating a 100 TB scan. (Reference analogue: vega
  * computes all row logic via serialized closures, SURVEY §2.9.)
  */
case class RollingHash(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rolling_hash requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  private final val Offset = 1469598103934665603L
  private final val Prime = 1099511628211L

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = Offset
    var i = 0
    while (i < bytes.length) {
      h = (h ^ (bytes(i) & 0xffL)) * Prime
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val b = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |byte[] $b = $c.getBytes();
         |long $h = ${Offset}L;
         |for (int $i = 0; $i < $b.length; $i++) {
         |  $h = ($h ^ ($b[$i] & 0xffL)) * ${Prime}L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

/** Session registration for graft's native functions. */
object GraftFunctions {

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_hash", exprs => RollingHash(exprs.head), "built-in")

  /** Column wrapper (requires register(spark) first in the session). */
  def rolling_hash(c: Column): Column = call_function("rolling_hash", c)
}

/** Cluster-wide injection point: SparkSession.builder()
  * .withExtensions(new GraftExtensions) — or
  * spark.sql.extensions=graft.functions.GraftExtensions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("rolling_hash"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[RollingHash].getName, "rolling_hash"),
        (exprs: Seq[Expression]) => RollingHash(exprs.head)))
}
