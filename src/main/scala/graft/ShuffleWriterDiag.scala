package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev diagnostic (r16, verdict item 6): A/B the shuffle WRITER on the
  * disk-bound big-corpus geometry, where the r15 gate-main rejection of
  * `bypassMergeThreshold=2` does not transfer.
  *
  * Background: ScaleCheck's >1000x runs shuffle at 32*factor/500 reduce
  * partitions (128 at 2000x) — under the default
  * `spark.shuffle.sort.bypassMergeThreshold=200`, every exchange there
  * takes the BypassMergeSortShuffleWriter (one file create per reduce
  * partition per map task, concatenated at the end), on the virtio ROOT
  * DISK (tmpfs is deliberately excluded from big runs: 16-29 GB of live
  * shuffle must not live in RAM). Forcing the serialized-sort writer
  * (threshold below the partition count) writes ONE spill file per map
  * task instead — the code path any >200-partition production shuffle
  * takes anyway. The r15 gate-SF A/B rejected the forced writer, but that
  * was measured on tmpfs where creates are free and rows are wide; the
  * big-run regime (disk creates, 128 opens+buffers per map task, narrow
  * exploded gram rows) is different and needs its own measurement (r15
  * backlog #6 / r15 verdict item 6).
  *
  * What it measures: the x_jaccard_join AGG stage (`Dedup.ppjoinAgg`) on
  * an existing big corpus — the committed `agg_2000x_s` cell's exact
  * workload (one gram-keyed exchange of the exploded shingle stream +
  * shuffle_hash df-attach + per-doc aggregate, ending in an eager
  * localCheckpoint), under ScaleCheck's big-run geometry (corpus-scaled
  * shuffle partitions, auto-broadcast off, zstd-6). The gram exchange is
  * the repo's largest single shuffle (~25-29 GB live at 2000x) — if the
  * writer choice matters anywhere at scale, it is here.
  *
  * Usage:
  *   SPARK_DRIVER_MEM=32g SPARK_GRAFT_BYPASS=<threshold> \
  *     sbt "runMain graft.ShuffleWriterDiag <bigCorpusDir> <factor> [reps]"
  * SPARK_GRAFT_BYPASS unset = Spark default (200 -> bypass writer at <=200
  * partitions); set it below the partition count (e.g. 8) to force the
  * serialized-sort writer. The corpus is built (or reused via the
  * ScaleCheck marker) from /root/testdata/sf0.1 with the same two-hop
  * replication as ScaleCheck >100x runs. Diagnostic only: never writes
  * SCALECHECK.json — the winning default is adopted in ScaleCheck's
  * builder and the measured pair recorded in SCALECHECK _meta by hand.
  */
object ShuffleWriterDiag {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/graft_sf2000")
    val factor = args.lift(1).map(_.toInt).getOrElse(2000)
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val src = "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val bypass = sys.env.get("SPARK_GRAFT_BYPASS")
    require(factor > 100 && factor % 100 == 0, "big-run diag: factor in 200..10000 step 100")
    val maxGb = Runtime.getRuntime.maxMemory / (1L << 30).toDouble
    require(maxGb >= 22.4, f"needs SPARK_DRIVER_MEM=32g (have $maxGb%.1f GiB)")
    // builder mirrors ScaleCheck's >100x big mode exactly (zstd-6/256k, no
    // tmpfs gate, spill-safety), plus the writer knob under test
    val b0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.io.compression.codec", "zstd")
      .config("spark.io.compression.zstd.level", "6")
      .config("spark.io.compression.zstd.bufferSize", "256k")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
    val b1 = bypass.fold(b0)(v =>
      b0.config("spark.shuffle.sort.bypassMergeThreshold", v))
    val spark = graft.plans.MemoryDiscipline.spillSafe(b1, cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val parts = math.max(cpus.toInt, cpus.toInt * factor / 500)
    println(s"SHUFFLEWRITER-DIAG factor=$factor parts=$parts " +
      s"bypassThreshold=${bypass.getOrElse("200 (default)")} " +
      s"writer=${if (bypass.exists(_.toInt < parts)) "serialized-sort" else "bypass"}")
    // two-hop corpus build, reused via ScaleCheck's marker when present
    ScaleCheck.materialize(spark, src, s"${out}_mid100", 100, corpusOnly = true)
    ScaleCheck.materialize(spark, s"${out}_mid100", out, factor / 100,
      idCap = graft.queries.PipelineQueries.BigOff, corpusOnly = true)
    // big-run runtime geometry (ScaleCheck withBigConf)
    spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    // warm the corpus into the page cache (the ScaleCheck discipline)
    val docsAll = Tables(spark, out, "documents")
    docsAll.select(hash(docsAll.columns.map(col): _*).as("h")).agg(sum("h")).collect()
    graft.functions.GraftFunctions.register(spark)
    def reclaim(): Unit = {
      System.gc(); Thread.sleep(3000)
      val freeGb = new java.io.File(
        sys.props.getOrElse("java.io.tmpdir", "/tmp")).getUsableSpace / 1e9
      println(f"SHUFFLEWRITER-DIAG disk headroom $freeGb%.0f GB")
    }
    val docs = docsAll.select("doc_id", "text")
    val injected = docs.where(col("doc_id") < 20)
      .select((col("doc_id") + graft.queries.PipelineQueries.BigOff).as("doc_id"),
        concat(col("text"), lit(" graftdup")).as("text"))
    val sh = docs.unionByName(injected).select(col("doc_id").as("id"),
      graft.functions.GraftFunctions.graft_shingles(
        graft.functions.TextFunctions.tokens(col("text")), 3).as("s"))
    reclaim()
    (1 to reps).foreach { rep =>
      val t0 = System.nanoTime()
      val agg = graft.operators.Dedup.ppjoinAgg(sh)
      val t = (System.nanoTime() - t0) / 1e9
      println(f"SHUFFLEWRITER-DIAG agg_${factor}x rep$rep $t%.2fs")
      agg.unpersist(blocking = true)
      reclaim()
    }
    spark.stop()
  }
}
