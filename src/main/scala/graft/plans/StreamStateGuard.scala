package graft.plans

import org.apache.spark.sql.streaming.StreamingQueryListener

/** Streaming twin of [[JoinBlowupListener]] (guard check 5): UNBOUNDED
  * STATE GROWTH. The scale-killer PlanGuard can't see and the join guard
  * doesn't watch: a stateful streaming operator whose state store only
  * ever grows — dropDuplicates with no watermark, an aggregation in
  * update mode whose watermark never advances, a mis-keyed
  * flatMapGroupsWithState that never times out — runs green for hours
  * and OOMs (heap store) or fills disks (RocksDB) only at production
  * volume. The engine already measures what's needed: every progress
  * event carries per-operator `numRowsTotal` and the event-time
  * watermark.
  *
  * Rule: a finding is recorded when one operator's state row count GROWS
  * for `minBatches` consecutive progress events while the watermark
  * never advances across any of them, and the count is at least
  * `minRows`. A watermark advance or a state shrink resets the window —
  * bounded-state queries under backfill (watermark marching, state
  * churning) never trip it; the no-watermark shapes above trip it within
  * a handful of batches.
  *
  * Observability, not a gate (the JoinBlowupListener contract): Spark
  * swallows listener exceptions, so findings are logged to stderr and
  * recorded in the same bounded-registry shape; harnesses that want a
  * hard gate call [[StreamStateGuard.assertClean]] after their run.
  * Registered via `spark.sql.streaming.streamingQueryListeners` in every
  * graft session builder that runs stream queries.
  *
  * Conf (read from the default session at event time; object-level
  * setters exist for harnesses without one): `spark.graft.streamGuard
  * .enabled` (default true), `.minBatches` (default 4), `.minRows`
  * (default 1,000,000).
  */
class StreamStateGuard extends StreamingQueryListener {
  import StreamStateGuard._

  override def onQueryStarted(
      event: StreamingQueryListener.QueryStartedEvent): Unit = ()

  override def onQueryProgress(
      event: StreamingQueryListener.QueryProgressEvent): Unit = {
    val (enabled, minBatches, minRows) = thresholds()
    if (!enabled) return
    val p = event.progress
    val wm = Option(p.eventTime.get("watermark")).getOrElse("")
    p.stateOperators.zipWithIndex.foreach { case (op, i) =>
      val key = (p.runId.toString, i)
      val rows = op.numRowsTotal
      val prev = track.get(key)
      val grewWithoutWatermark =
        prev != null && rows > prev.rows && wm == prev.watermark
      val streak = if (grewWithoutWatermark) prev.streak + 1 else 0
      track.put(key, Cell(rows, wm, streak))
      if (streak >= minBatches && rows >= minRows) {
        val f = Finding(p.name, Option(op.operatorName).getOrElse(s"op$i"),
          rows, streak)
        record(f)
        System.err.println(s"[graft.streamGuard] $f")
        // one finding per streak: restart the window so a long-running
        // leak logs once per minBatches, not once per batch
        track.put(key, Cell(rows, wm, 0))
      }
    }
  }

  override def onQueryTerminated(
      event: StreamingQueryListener.QueryTerminatedEvent): Unit = {
    val run = event.runId.toString
    val it = track.keySet().iterator()
    while (it.hasNext) if (it.next()._1 == run) it.remove()
  }
}

object StreamStateGuard {
  final case class Finding(query: String, operator: String, rows: Long,
      streak: Int) {
    override def toString: String =
      s"unbounded state: query '$query' operator '$operator' grew to " +
        s"$rows state rows over $streak consecutive batches with no " +
        "watermark advance - the state store has no eviction path; add a " +
        "watermark (or event-time timeout) or this grows until the " +
        "executor dies"
  }

  private final case class Cell(rows: Long, watermark: String, streak: Int)

  private val track =
    new java.util.concurrent.ConcurrentHashMap[(String, Int), Cell]()
  private val findings =
    new java.util.concurrent.ConcurrentLinkedQueue[Finding]()

  private def record(f: Finding): Unit = {
    findings.add(f)
    while (findings.size() > 64) findings.poll() // bounded registry
  }

  private def thresholds(): (Boolean, Int, Long) = {
    val conf = org.apache.spark.sql.SparkSession.getDefaultSession.map(_.conf)
    def get(key: String): Option[String] = conf.flatMap(_.getOption(key))
    (get("spark.graft.streamGuard.enabled").forall(_.toBoolean),
      get("spark.graft.streamGuard.minBatches").map(_.toInt).getOrElse(4),
      get("spark.graft.streamGuard.minRows").map(_.toLong).getOrElse(1000000L))
  }

  def recent(): Seq[Finding] = {
    import scala.jdk.CollectionConverters._
    findings.asScala.toSeq
  }

  def clear(): Unit = { findings.clear(); track.clear() }

  /** Hard gate for harnesses: throw if any stream leaked state. */
  def assertClean(): Unit = {
    val fs = recent()
    if (fs.nonEmpty)
      throw new IllegalStateException(
        s"stream state guard found ${fs.size} finding(s):\n" +
          fs.mkString("\n"))
  }
}
