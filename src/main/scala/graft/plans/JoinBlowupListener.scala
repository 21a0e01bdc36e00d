package graft.plans

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Runtime twin of [[PlanGuard]] (the r9 verdict's "check 4"): the exact
  * set-join family's failure mode — an inverted-list/bucket join whose
  * OUTPUT explodes relative to its inputs — is invisible at planning time
  * (the plan is a perfectly ordinary equi-join; the blowup is a DATA
  * property). It is, however, already measured by the engine: every join
  * operator carries a `numOutputRows` SQL metric. This listener reads
  * those metrics POST-RUN (zero extra passes, zero extra shuffles — the
  * cost is one plan-tree walk per query, measured ~0.1 ms) and flags any
  * join whose output exceeds `factor` x its larger input AND an absolute
  * `minRows` floor — the signature of a hot key/bucket that outgrew its
  * cap, at thresholds the suite's legitimate candidate-generation joins
  * (LSH bands, prefix lists: output ≲ occupancy x input) never reach.
  *
  * Observability, not a gate: a QueryExecutionListener runs after the
  * query already succeeded and Spark swallows listener exceptions, so
  * findings are logged as warnings and recorded in a bounded registry;
  * harnesses that want a hard gate call [[JoinBlowupListener.assertClean]]
  * after their run (the specs do). Registered in every graft session via
  * `spark.sql.queryExecutionListeners` alongside the PlanGuard extension.
  *
  * The same walk also reads GenerateExec (explode/posexplode) output
  * metrics: the identity-collapse expansion (Dedup.scala's C(g,2)
  * pair-emitter) is a generator, not a join, and a cap bug there would
  * blow up invisibly to the join check. Generators get their OWN, much
  * higher threshold (`genFactor`, default 4096 at `genMinRows` 50M):
  * legitimate corpus explodes (shingling, banding) expand by
  * tokens-per-document — hundreds — while a cap escape on a g-sized
  * duplicate group expands by g²/2 per row, which at the g≥10⁴ corpora
  * worth guarding is ≥10⁷x. The gap between the two regimes is ~4 orders
  * of magnitude; 4096 sits in it with margin on both sides.
  *
  * Conf: `spark.graft.runtimeGuard.enabled` (default true),
  * `.factor` (default 32), `.minRows` (default 10_000_000),
  * `.genFactor` (default 4096), `.genMinRows` (default 50_000_000).
  */
class JoinBlowupListener extends QueryExecutionListener {

  override def onSuccess(funcName: String, qe: QueryExecution,
      durationNs: Long): Unit = {
    val conf = qe.sparkSession.conf
    if (!conf.getOption("spark.graft.runtimeGuard.enabled")
      .forall(_.toBoolean)) return
    val factor = conf.getOption("spark.graft.runtimeGuard.factor")
      .map(_.toLong).getOrElse(32L)
    val minRows = conf.getOption("spark.graft.runtimeGuard.minRows")
      .map(_.toLong).getOrElse(10000000L)
    val genFactor = conf.getOption("spark.graft.runtimeGuard.genFactor")
      .map(_.toLong).getOrElse(4096L)
    val genMinRows = conf.getOption("spark.graft.runtimeGuard.genMinRows")
      .map(_.toLong).getOrElse(50000000L)
    JoinBlowupListener.inspect(qe.executedPlan, factor, minRows,
        genFactor, genMinRows)
      .foreach { f =>
        JoinBlowupListener.record(f)
        System.err.println(s"[graft.runtimeGuard] $f")
      }
  }

  override def onFailure(funcName: String, qe: QueryExecution,
      exception: Exception): Unit = ()
}

object JoinBlowupListener {

  /** One flagged join: the node's name, its output rows, and the larger
    * input's rows — everything needed to judge the blowup by eye.
    */
  final case class Finding(node: String, outputRows: Long, maxInputRows: Long,
      kind: String = "join") {
    override def toString: String =
      s"$kind blowup: $node produced $outputRows rows from a " +
        s"max input of $maxInputRows (ratio ${outputRows / math.max(1L, maxInputRows)}x) " +
        "- a hot key/bucket outgrew its occupancy cap; re-check the " +
        "bucketing scheme's split/cap parameters"
  }

  private val findings =
    new java.util.concurrent.ConcurrentLinkedQueue[Finding]()

  private def record(f: Finding): Unit = {
    findings.add(f)
    while (findings.size() > 64) findings.poll() // bounded registry
  }

  def recent(): Seq[Finding] = {
    import scala.jdk.CollectionConverters._
    findings.asScala.toSeq
  }

  def clear(): Unit = findings.clear()

  /** Hard-gate entry point for harnesses: throw if any blowup was
    * recorded since the last clear().
    */
  def assertClean(): Unit = {
    val fs = recent()
    if (fs.nonEmpty)
      throw new PlanGuardViolation(
        s"runtime join-blowup guard recorded ${fs.size} finding(s):\n" +
          fs.mkString("\n"))
  }

  /** Walk the executed plan (through AQE wrappers), read each join and
    * generator node's numOutputRows metric against its children's, return
    * the blowups. Exposed for the spec and for overhead measurement.
    */
  def inspect(plan: SparkPlan, factor: Long, minRows: Long,
      genFactor: Long = 4096L, genMinRows: Long = 50000000L): Seq[Finding] = {
    val out = scala.collection.mutable.Buffer[Finding]()
    // AQE hides subtrees behind leaf wrappers: AdaptiveSparkPlanExec's
    // final plan and QueryStageExec's materialized stage both hang off a
    // field, not children — unwrap recursively or the walk never reaches
    // a join that ran inside a stage.
    def unwrap(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => unwrap(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        unwrap(q.plan)
      case other => other
    }
    def inputRows(p: SparkPlan): Option[Long] = {
      // nearest measuring descendants, SUMMED: a multi-child pass-through
      // (union) contributes every branch's count — taking only the first
      // branch would understate the input and manufacture false blowups.
      // Joins/generators terminate the descent (their own inputs are not
      // THIS node's input).
      val root = unwrap(p)
      if (root.metrics.contains("numOutputRows"))
        Some(root.metrics("numOutputRows").value)
      else if (isJoin(root) || isGenerate(root)) None
      else {
        val kids = root.children.flatMap(inputRows)
        if (kids.isEmpty) None else Some(kids.sum)
      }
    }
    def isJoin(p: SparkPlan): Boolean = p match {
      case _: org.apache.spark.sql.execution.joins.SortMergeJoinExec => true
      case _: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => true
      case _: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => true
      case _: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => true
      case _: org.apache.spark.sql.execution.joins.CartesianProductExec => true
      case _ => false
    }
    def isGenerate(p: SparkPlan): Boolean =
      p.isInstanceOf[org.apache.spark.sql.execution.GenerateExec]
    def walk(p: SparkPlan): Unit = {
      val n = unwrap(p)
      val join = isJoin(n)
      val gen = isGenerate(n)
      if ((join || gen) && n.metrics.contains("numOutputRows")) {
        val o = n.metrics("numOutputRows").value
        val (floor, ratio, kind) =
          if (join) (minRows, factor, "join") else (genMinRows, genFactor, "generator")
        if (o >= floor) {
          val ins = n.children.flatMap(inputRows)
          if (ins.nonEmpty) {
            val maxIn = ins.max
            if (o > ratio * math.max(1L, maxIn))
              out += Finding(n.nodeName, o, maxIn, kind)
          }
        }
      }
      n.children.foreach(walk)
      n.subqueries.foreach(walk)
    }
    walk(plan)
    out.toSeq
  }
}
