package graft.engine

/** Approximate-result shims (reference: src/partial/, SURVEY §2.9).
  * Thin wrappers over Spark core's own partial-result machinery — vega ported
  * Spark's `BoundedDouble`/`PartialResult`/`CountEvaluator`, so the contract
  * (mean + finality; interval width implementation-defined) matches.
  */
object approx {

  /** reference src/partial/bounded_double.rs:6-24 */
  final case class BoundedDouble(mean: Double, confidence: Double, low: Double, high: Double)

  object BoundedDouble {
    def fromSpark(bd: org.apache.spark.partial.BoundedDouble): BoundedDouble =
      BoundedDouble(bd.mean, bd.confidence, bd.low, bd.high)
  }

  /** Grouped partial result (reference src/partial/grouped_count_evaluator.rs):
    * per-key bounded estimates with the same initial/final contract.
    */
  final class GroupedPartialResult[T](
      underlying: org.apache.spark.partial.PartialResult[
        scala.collection.Map[T, org.apache.spark.partial.BoundedDouble]]) {
    private def conv(m: scala.collection.Map[T, org.apache.spark.partial.BoundedDouble]) =
      m.map { case (k, v) => k -> BoundedDouble.fromSpark(v) }
    def initialValue: scala.collection.Map[T, BoundedDouble] = conv(underlying.initialValue)
    def isInitialValueFinal: Boolean = underlying.isInitialValueFinal
    def getFinalValue(): scala.collection.Map[T, BoundedDouble] =
      conv(underlying.getFinalValue())
  }

  /** reference src/partial/partial_result.rs:17-100 */
  final class PartialResult[R](
      underlying: org.apache.spark.partial.PartialResult[org.apache.spark.partial.BoundedDouble],
      toR: org.apache.spark.partial.BoundedDouble => R) {
    def initialValue: R = toR(underlying.initialValue)
    def isInitialValueFinal: Boolean = underlying.isInitialValueFinal
    def getFinalValue(): R = toR(underlying.getFinalValue())
  }
}
