package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.Cross
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Thrown by [[PlanGuard]] when a query plan contains a known scale-killer.
  * A dedicated type so callers (and specs) can catch the guard precisely
  * instead of pattern-matching message strings.
  */
final class PlanGuardViolation(msg: String) extends RuntimeException(msg)

/** Plan linter, injected as an optimizer rule: FAIL FAST on the plan shapes
  * that work fine at test scale and melt down at 100 TB, instead of letting
  * them reach execution and funnel a cluster through one task.
  *
  * Checks (read-only — the rule never rewrites the plan):
  *
  *  1. A `Window` with an EMPTY partition spec whose child is estimated
  *     larger than `spark.graft.planGuard.maxWindowBytes` (default 1 GiB).
  *     An un-partitioned window moves EVERY row into a single partition —
  *     the classic `row_number() OVER (ORDER BY ...)` global-ordinal
  *     mistake (graft's x_global_ids exists precisely to replace it with
  *     zipWithIndex). Small frames (per-source stats, top-k results) pass:
  *     a global rank over 20 rows is the right plan, over 10 TB it is an
  *     outage.
  *  2. A cartesian join — `Cross` join type or an inner join with NO
  *     condition — where BOTH sides are estimated larger than
  *     `spark.graft.planGuard.maxCartesianBytes` (default 128 MiB). A
  *     broadcast-sized side is a legitimate nested-loop probe; two big
  *     sides is an |A|x|B| explosion.
  *  3. Positional indexing of a DERIVED array inside a lambda:
  *     `element_at(arr, i)` / `arr[i]` where `arr` is not a bare column
  *     but an expression that itself contains a split/regexp/higher-order
  *     derivation. Catalyst's projection collapse inlines the array's
  *     WHOLE derivation into every per-element call, turning an O(n)
  *     scan into O(n^2) per row — measured as an 80s-vs-1s difference on
  *     a per-token md5 chain (x_cdc_chunks' first formulation). The fix
  *     is always the same: fold/transform over the array's ELEMENTS, or
  *     materialize the derived array in a separate, non-collapsible step.
  *
  * Size estimates come from logical-plan statistics (`sizeInBytes`), which
  * Spark maintains bottom-up from file-scan sizes — the same signal the
  * broadcast-join planner trusts. Leaves with UNKNOWN stats default to
  * `spark.sql.defaultSizeInBytes` (Long.Max), so an RDD-backed frame under
  * a global window trips the guard conservatively: if the engine cannot
  * bound it, neither can the cluster.
  *
  * Escape hatch: `spark.graft.planGuard.enabled=false` per session or per
  * query block. The rule is registered by [[graft.functions.GraftExtensions]]
  * (`spark.sql.extensions=graft.functions.GraftExtensions`), so every graft
  * session — Verify, Bench, every ScalaTest spec — runs under the guard;
  * the 157-query suite passing IS the evidence that no shipped plan
  * contains these shapes.
  */
case class PlanGuard(spark: SparkSession) extends Rule[LogicalPlan] {

  /** A join that pairs every left row with every right row: an explicit
    * Cross, a condition-less join of any type, or a row-multiplying join
    * whose ON clause references columns from only ONE side (or neither),
    * which constrains nothing about the PAIRING and plans as BNLJ/cartesian
    * too. This rule runs in the user-provided-optimizer batch after
    * PushPredicateThroughJoin and constant folding, so the inner-join
    * variants of this mistake (`ON 1=1`, `ON left.flag = 'A'`) have
    * already been simplified to an empty condition (first disjunct); the
    * shape that genuinely survives to this point is an OUTER join whose
    * condition touches only the preserved side — e.g. `A LEFT JOIN B ON
    * a.x > 5` pairs each qualifying A row with EVERY B row. Semi/anti
    * joins are exempt: their output never exceeds one side.
    */
  private def isCartesianLike(j: Join): Boolean = {
    import org.apache.spark.sql.catalyst.plans.{FullOuter, Inner, LeftOuter, RightOuter}
    j.joinType == Cross || j.condition.isEmpty || {
      val rowMultiplying = j.joinType match {
        case Inner | Cross | LeftOuter | RightOuter | FullOuter => true
        case _ => false
      }
      rowMultiplying && j.condition.exists { c =>
        c.references.intersect(j.left.outputSet).isEmpty ||
          c.references.intersect(j.right.outputSet).isEmpty
      }
    }
  }

  private def confBool(key: String, default: Boolean): Boolean =
    spark.conf.getOption(key).map(_.toBoolean).getOrElse(default)
  private def confBytes(key: String, default: Long): Long =
    spark.conf.getOption(key).map(_.toLong).getOrElse(default)

  /** Check 3: an array argument of element_at / [] inside a lambda body
    * that is itself a derivation (contains a higher-order function or a
    * string split) — the projection-collapse O(n^2) trap. Bare
    * attributes, lambda variables and literals are fine: indexing a
    * MATERIALIZED array is O(1).
    */
  private def lambdaIndexedDerivedArray(
      root: org.apache.spark.sql.catalyst.expressions.Expression): Boolean = {
    import org.apache.spark.sql.catalyst.expressions._
    def derived(arr: Expression): Boolean = arr match {
      case _: Attribute | _: NamedLambdaVariable | _: Literal => false
      case e => e.exists {
        case _: HigherOrderFunction => true
        case _: StringSplit => true
        case _: RegExpExtract => true
        case _ => false
      }
    }
    var bad = false
    root.foreach {
      case lf: LambdaFunction =>
        lf.function.foreach {
          case ea: ElementAt if derived(ea.left) => bad = true
          case ga: GetArrayItem if derived(ga.child) => bad = true
          case _ => ()
        }
      case _ => ()
    }
    bad
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!confBool("spark.graft.planGuard.enabled", default = true)) return plan
    val maxWindow = confBytes("spark.graft.planGuard.maxWindowBytes", 1L << 30)
    val maxCartesian = confBytes("spark.graft.planGuard.maxCartesianBytes", 128L << 20)
    plan.foreach {
      case w: Window if w.partitionSpec.isEmpty =>
        val bytes = w.child.stats.sizeInBytes
        if (bytes > maxWindow)
          throw new PlanGuardViolation(
            s"un-partitioned Window over an estimated $bytes bytes funnels every row " +
              s"through ONE task (cap: spark.graft.planGuard.maxWindowBytes=$maxWindow). " +
              "Partition the window, pre-aggregate to a small frame, or use " +
              "zipWithIndex for global ordinals. Disable per session with " +
              "spark.graft.planGuard.enabled=false.")
      case j: Join if isCartesianLike(j) =>
        val (l, r) = (j.left.stats.sizeInBytes, j.right.stats.sizeInBytes)
        if (l > maxCartesian && r > maxCartesian)
          throw new PlanGuardViolation(
            s"cartesian join with both sides large (est. $l x $r bytes; cap: " +
              s"spark.graft.planGuard.maxCartesianBytes=$maxCartesian per side) — " +
              "an |A|x|B| row explosion. Add a join condition that constrains " +
              "BOTH sides, broadcast a genuinely small side, or disable per " +
              "session with spark.graft.planGuard.enabled=false.")
      case _ => ()
    }
    if (confBool("spark.graft.planGuard.lambdaIndex.enabled", default = true))
      plan.foreach { node =>
        node.expressions.foreach { e =>
          if (lambdaIndexedDerivedArray(e))
            throw new PlanGuardViolation(
              "element_at/[] on a DERIVED array inside a lambda: projection " +
                "collapse inlines the array's whole derivation into every " +
                "per-element call — O(n^2) per row (measured 80s vs 1s on a " +
                "per-token md5 chain). Fold or transform over the array's " +
                "ELEMENTS instead, or materialize the derived array in a " +
                "separate step. Disable with " +
                "spark.graft.planGuard.lambdaIndex.enabled=false.")
        }
      }
    plan
  }
}
