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
    val p = event.progress
    val (enabled, minBatches, minRows) = overrideFor match {
      // name-scoped override: applies ONLY to streams whose query name
      // carries the registered prefix, so a harness provoking a finding
      // at tiny thresholds cannot re-threshold unrelated concurrent
      // streams (the bench parallel phase runs many at once)
      case Some((prefix, mb, mr))
          if Option(p.name).exists(_.startsWith(prefix)) => (true, mb, mr)
      case _ => thresholds()
    }
    // batch counters run regardless of the guard toggle (observability,
    // not a gate — a query section that disables the guard must still be
    // attributable in the bench's per-pass batch counts)
    StreamStateGuard.countBatch(p)
    if (!enabled) return
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
          rows, streak, p.runId.toString)
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
    // listener-bus delivery is FIFO per listener, so once the terminated
    // event lands here every progress event for the run has been
    // processed and findingsFor(run) is FINAL — recorded so gates can
    // wait for exactness instead of a fixed drain sleep
    markTerminated(run)
  }
}

object StreamStateGuard {
  final case class Finding(query: String, operator: String, rows: Long,
      streak: Int, runId: String = "") {
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

  // r16 observability (verdict r15 #3): per-stream micro-batch counters,
  // accumulated from the SAME progress events the guard already receives —
  // so a bench's CONTENDED parallel pass can publish each stream query's
  // in-pass batch count and summed triggerExecution ms, and a contended
  // inflation decomposes into "more triggers" vs "slower triggers" from
  // the run log alone. Keyed by the graft-* fixture tag in the source
  // description (stable per query; memory-sink names carry per-run UUIDs),
  // bounded by the stream-query population.
  private val batches =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Long)]()

  private def streamTag(
      p: org.apache.spark.sql.streaming.StreamingQueryProgress): String = {
    val src = p.sources.headOption.map(s => String.valueOf(s.description))
      .getOrElse("")
    // letters only: Tmp.dir appends a random numeric suffix per invocation
    // ("graft-swin63525..."), and the tag must be stable across passes and
    // rounds for the counts to be comparable
    "graft-[a-z]+".r.findFirstIn(src)
      .orElse(Option(p.name).map(_.replaceAll("[0-9a-f]{16,}", "")))
      .getOrElse("unnamed")
  }

  private[plans] def countBatch(
      p: org.apache.spark.sql.streaming.StreamingQueryProgress): Unit = {
    val tag = streamTag(p)
    val trig = Option(p.durationMs.get("triggerExecution"))
      .map(_.longValue()).getOrElse(0L)
    batches.merge(tag, (1L, trig),
      (a, b) => (a._1 + b._1, a._2 + b._2))
    ()
  }

  /** Drain the per-stream batch counters (returns and clears) — the bench
    * calls this after each pass so counts are per-pass, not cumulative.
    */
  def drainBatchCounts(): Seq[(String, Long, Long)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
    val it = batches.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out += ((e.getKey, e.getValue._1, e.getValue._2))
      it.remove()
    }
    out.sortBy(_._1).toSeq
  }

  private def record(f: Finding): Unit = {
    findings.add(f)
    while (findings.size() > 64) findings.poll() // bounded registry
  }

  // One-time warning latch for malformed guard confs: a listener callback
  // that throws is SWALLOWED by Spark, so a bad `.toInt` here used to
  // silently disable the guard with no finding and no signal. Parse
  // defensively, warn once, fall back to defaults — a bad conf degrades
  // loudly instead of muting the guard.
  private val warnedBadConf = new java.util.concurrent.atomic.AtomicBoolean(false)

  private def thresholds(): (Boolean, Int, Long) = {
    val conf = org.apache.spark.sql.SparkSession.getDefaultSession.map(_.conf)
    def get(key: String): Option[String] = conf.flatMap(_.getOption(key))
    def parsed[A](key: String, parse: String => A, default: A): A =
      get(key).flatMap { raw =>
        scala.util.Try(parse(raw)).toOption.orElse {
          if (warnedBadConf.compareAndSet(false, true))
            System.err.println(s"[graft.streamGuard] malformed conf $key=" +
              s"'$raw' — using default $default (guard stays active)")
          None
        }
      }.getOrElse(default)
    (parsed("spark.graft.streamGuard.enabled", _.toBoolean, true),
      parsed("spark.graft.streamGuard.minBatches", _.toInt, 4),
      parsed("spark.graft.streamGuard.minRows", _.toLong, 1000000L))
  }

  def recent(): Seq[Finding] = {
    import scala.jdk.CollectionConverters._
    findings.asScala.toSeq
  }

  // (namePrefix, minBatches, minRows) — see withThresholds
  private val overrideSlot = new java.util.concurrent.atomic.AtomicReference[
    Option[(String, Int, Long)]](None)
  private def overrideFor: Option[(String, Int, Long)] = overrideSlot.get()

  // bounded set of runIds whose QueryTerminatedEvent the listener has
  // processed — the "findings for this run are final" signal gates wait
  // on (FIFO bus: terminated-processed implies all progress processed)
  private val terminated =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private val terminatedOrder =
    new java.util.concurrent.ConcurrentLinkedQueue[String]()
  private def markTerminated(run: String): Unit = {
    if (terminated.add(run)) terminatedOrder.add(run)
    while (terminated.size() > 256) { // bounded, like the findings registry
      val old = terminatedOrder.poll()
      if (old != null) terminated.remove(old) else return
    }
  }

  /** Has the listener processed the run's terminated event? Once true,
    * [[findingsFor]] of that run can no longer change.
    */
  def terminatedSeen(runId: String): Boolean = terminated.contains(runId)

  /** Run `body` with guard thresholds overridden for streams whose query
    * NAME starts with `namePrefix` — the negative-path harness hook
    * (x_stream_state_guard provokes a finding on a deliberately
    * watermark-less dedup at tiny thresholds without re-thresholding the
    * unrelated streams a parallel bench phase runs concurrently). The
    * override also forces the guard enabled for matching streams. NOT
    * reentrant (one override slot per JVM, matching the registry's
    * JVM-global scope) — and that is now ENFORCED: a nested or concurrent
    * call used to silently clobber the active override and then de-scope
    * it mid-flight from its finally block (r13 advice); it now throws
    * before touching the slot.
    */
  def withThresholds[A](namePrefix: String, minBatches: Int,
      minRows: Long)(body: => A): A = {
    val mine = Some((namePrefix, minBatches, minRows))
    if (!overrideSlot.compareAndSet(None, mine))
      throw new IllegalStateException(
        s"StreamStateGuard.withThresholds is not reentrant: override " +
          s"${overrideSlot.get()} is already active (one slot per JVM)")
    try body finally overrideSlot.compareAndSet(mine, None)
  }

  /** Findings recorded for ONE streaming run — the scoped view for
    * harnesses that deliberately provoke a finding (x_stream_state_guard)
    * and must not trip another suite's [[assertClean]] gate.
    */
  def findingsFor(runId: String): Seq[Finding] =
    recent().filter(_.runId == runId)

  def clear(): Unit = { findings.clear(); track.clear() }

  /** Drop one run's findings only — the scoped twin of [[clear]] for
    * callers that provoked a finding on purpose and own just that run.
    */
  def clearRun(runId: String): Unit =
    findings.removeIf(_.runId == runId)

  /** Hard gate for harnesses: throw if any stream leaked state.
    *
    * SCOPE: the findings registry is a JVM-global singleton shared by
    * every SparkSession in the process — this gate sees findings from ANY
    * query in ANY session since the last [[clear]]. A harness that
    * intentionally provokes a finding must [[clearRun]] its own runId (or
    * [[clear]] everything) before another harness's gate runs; gates that
    * only care about their own stream should use [[findingsFor]].
    */
  def assertClean(): Unit = {
    val fs = recent()
    if (fs.nonEmpty)
      throw new IllegalStateException(
        s"stream state guard found ${fs.size} finding(s):\n" +
          fs.mkString("\n"))
  }
}
