package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Memory-pressure stress (dev main, not part of the driver contract):
  * runs ONE SparkEntry query end-to-end at a ScaleCheck-materialized
  * corpus under a deliberately small heap (set via SPARK_DRIVER_MEM, e.g.
  * 3g vs the sandbox's 128 GiB) and reports whether the query SPILLED or
  * DIED. The claim under test is the difference that matters at 100 TB:
  * every blocking operator in the heavy family (the collect_list
  * identity-group aggregates in Dedup.ppjoinAgg/crossJaccardAgg, the
  * pair-verify sort-merge paths, the streaming state stores) must degrade
  * to disk spill under memory pressure, never OOM — Spark's
  * UnsafeExternalSorter/ExternalAppendOnlyMap contract, which holds only
  * if no operator materializes an unbounded driver- or task-local
  * structure outside the memory manager's accounting.
  *
  * One query per JVM by design: an OOM kills the local-mode JVM (driver
  * and executor share it), so isolation is the only honest protocol —
  * the orchestrating script (scripts/memstress.sh) records a dead JVM as
  * outcome=oom and moves on.
  *
  * Output: one `MEMSTRESS {json}` line with wall seconds, total shuffle
  * spill (in-memory + disk bytes, summed over tasks), max task
  * peakExecutionMemory, and the JVM's actual max heap.
  *
  * Run: SPARK_DRIVER_MEM=3g sbt "runMain graft.MemStress <sfDir> <query>"
  */
object MemStress {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: MemStress <sfDir> <queryName>")
    val (sfDir, name) = (args(0), args(1))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // production knobs, NOT stress-special ones: the point is that the
    // shipped partitioning spills gracefully, not that a tuned-down
    // configuration can be made to fit. MemoryDiscipline IS a production
    // knob — it keys on heap-per-core, the same rule an executor ships.
    val spark = graft.plans.MemoryDiscipline.spillSafe(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.queryExecutionListeners",
        "graft.plans.JoinBlowupListener")
      .config("spark.sql.streaming.streamingQueryListeners",
        "graft.plans.StreamStateGuard"), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val spillMem = new java.util.concurrent.atomic.AtomicLong()
    val spillDisk = new java.util.concurrent.atomic.AtomicLong()
    val peakExec = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          spillMem.addAndGet(m.memoryBytesSpilled)
          spillDisk.addAndGet(m.diskBytesSpilled)
          peakExec.accumulateAndGet(m.peakExecutionMemory, Math.max(_, _))
        }
      }
    })
    val heapMb = Runtime.getRuntime.maxMemory() / (1024 * 1024)
    val t0 = System.nanoTime()
    val outcome =
      try { SparkEntry.queries(name)(spark, sfDir).collect(); "ok" }
      catch {
        // an OOM that surfaces as a caught throwable (driver-side alloc,
        // or a SparkException wrapping an executor-thread OOM) — the
        // uncatchable case (JVM death) is the wrapper script's to record
        case e: Throwable =>
          val oom = Iterator.iterate(e: Throwable)(_.getCause)
            .takeWhile(_ != null).take(8)
            .exists(_.isInstanceOf[OutOfMemoryError])
          System.err.println(s"MEMSTRESS-ERR $name ${e.getClass.getName}: " +
            String.valueOf(e.getMessage).take(300))
          if (oom) "oom" else "err"
      }
    val secs = (System.nanoTime() - t0) / 1e9
    // give straggler task-end events a beat to reach the listener bus
    // (listenerBus.waitUntilEmpty is private[spark]; a short sleep after
    // the blocking collect() is enough — events are enqueued at task end)
    Thread.sleep(2000)
    def mb(b: Long): Long = b / (1024 * 1024)
    println(s"""MEMSTRESS {"query":"$name","outcome":"$outcome",""" +
      Bench.fmt(""""s":%.2f,""", secs) +
      s""""spill_mem_mb":${mb(spillMem.get)},"spill_disk_mb":${mb(spillDisk.get)},""" +
      s""""peak_exec_mb":${mb(peakExec.get)},"heap_mb":$heapMb,""" +
      s""""shuffle_partitions":$cpus,"sf_dir":"$sfDir"}""")
    spark.stop()
    if (outcome != "ok") sys.exit(3)
  }
}
