package graft.plans

import org.apache.spark.sql.SparkSession

/** Heap-proportional spill-safety knobs — the fix for a JVM-death mode the
  * memory-pressure stress (graft.MemStress) reproduced deterministically:
  * when a hash aggregate spills and then merges its spill files, every
  * open [[org.apache.spark.util.collection.unsafe.sort.UnsafeSorterSpillReader]]
  * allocates read-ahead buffers of
  * `spark.unsafe.sorter.spill.reader.buffer.size` (1 MiB default, doubled
  * by ReadAheadInputStream) OUTSIDE the memory manager's accounting. At a
  * healthy heap-per-core ratio that's noise; at a small one (observed: 3g
  * heap / 32 cores on x_embed_dedup's banding aggregate, and 8g / 32 on
  * x_knn_join's 1000x verify merge) the buffers are G1 humongous
  * allocations churning on a nearly-full heap, and the task dies with
  * OutOfMemoryError at `ReadAheadInputStream.<init>` instead of degrading
  * to disk — the exact failure the spill contract exists to prevent.
  *
  * The discipline: below [[SafeBytesPerCore]] of heap per task slot, turn
  * read-ahead off — the reader falls back to ONE plain buffered stream of
  * `spark.unsafe.sorter.spill.reader.buffer.size` (whose floor Spark pins
  * at 1 MiB, so the buffer itself can't shrink further), halving the
  * per-reader footprint and killing the dedicated read-ahead threads'
  * churn. Above it, leave Spark's defaults — read-ahead is a real win
  * when spill merges are disk-bound and heap is plentiful. On a
  * production cluster the same rule applies per executor
  * (executor-memory / executor-cores); 512 MiB/core is the boundary the
  * two observed failures bracket (96 MiB/core died, 2 GiB/core never has;
  * 256 MiB/core died once at 1000x).
  *
  * The WRITE-side twin (found by the same stress at 1200m/32 = 37
  * MiB/core on x_video_dedup's signature aggregate): every
  * [[org.apache.spark.util.collection.unsafe.sort.UnsafeSorterSpillWriter]]
  * allocates a `spark.shuffle.spill.diskWriteBufferSize` byte array (1
  * MiB default) at construction — i.e. AT THE MOMENT the memory manager
  * decided the heap was full and asked the aggregate to spill. 32 tasks
  * spilling together ask for 32 unaccounted 1 MiB G1-humongous buffers
  * on a heap that by definition has none to give, and the task dies at
  * `UnsafeSorterSpillWriter.<init>` instead of degrading (observed with
  * GCLocker retry storms). Under the same boundary the buffer shrinks to
  * 128 KiB — not humongous, 1/8 the footprint, and spill write
  * throughput is not the bottleneck on a heap this tight.
  */
object MemoryDiscipline {
  private[graft] val SafeBytesPerCore: Long = 512L * 1024 * 1024

  /** Heap-per-core this JVM actually has, given `cores` task slots. */
  private[graft] def bytesPerCore(cores: Int): Long =
    Runtime.getRuntime.maxMemory() / math.max(cores, 1)

  private val SpillSafetyPair =
    Map("spark.unsafe.sorter.spill.read.ahead.enabled" -> "false",
      "spark.shuffle.spill.diskWriteBufferSize" -> (128 * 1024).toString)

  /** The knobs a given core count earns on this JVM: empty at a healthy
    * heap-per-core ratio, the spill-safety pair under [[SafeBytesPerCore]].
    *
    * Override: `GRAFT_MEM_KNOBS=on|off` (env, or the `graft.memKnobs`
    * system property for tests) forces the pair on or off regardless of
    * the boundary — the A/B lever for attributing warm-time drift to the
    * knobs (r12 verdict #1b: 8g/32 cores = 256 MiB/core sits under the
    * boundary, so every standard bench run earns them silently; the
    * bisection needs a knobs-off run on the same box).
    */
  private[graft] def knobs(cores: Int): Map[String, String] =
    sys.env.get("GRAFT_MEM_KNOBS").orElse(sys.props.get("graft.memKnobs")) match {
      case Some("off") => Map.empty
      case Some("on") => SpillSafetyPair
      case _ =>
        if (bytesPerCore(cores) < SafeBytesPerCore) SpillSafetyPair
        else Map.empty
    }

  /** Apply the spill-safety knobs to `builder` when this JVM's heap-per-
    * core sits under the safe boundary; identity otherwise. Call with the
    * same core count passed to `local[n]`.
    */
  def spillSafe(builder: SparkSession.Builder,
      cores: Int): SparkSession.Builder =
    knobs(cores).foldLeft(builder) { case (b, (k, v)) => b.config(k, v) }
}
