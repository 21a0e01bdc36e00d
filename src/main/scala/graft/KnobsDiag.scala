package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, hash, sum}

/** MemoryDiscipline A/B bisection (r12 verdict #1b): every standard bench
  * session at 8g/32 cores = 256 MiB/core sits under the 512 MiB/core
  * spill-safety boundary, so the knobs (spill read-ahead off + 128 KiB
  * spill-write buffer) govern EVERY published warm cell — and r12's
  * uniform ~1.2 warm_norm drift was unattributed between "knobs tax" and
  * box drift. This main runs the r12 warm watchlist SERIALLY, min-of-3,
  * under whatever GRAFT_MEM_KNOBS says (on/off/auto), and prints one
  * parseable line per query — run it twice (GRAFT_MEM_KNOBS=on, =off) on
  * the same box back-to-back and diff the columns; the paired numbers go
  * to NOTES.
  *
  * Run: GRAFT_MEM_KNOBS=off SPARK_GRAFT_CPUS=32 sbt "runMain graft.KnobsDiag"
  */
object KnobsDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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
    val knobs = graft.plans.MemoryDiscipline.knobs(cpus.toInt)
    println(s"KNOBSDIAG mem_knobs=${knobs.nonEmpty} ($knobs)")
    // same untimed preamble as Bench: column-page table warmup + cal pair
    try {
      graft.Tables.names.foreach { t =>
        val df = Tables(spark, sfDir, t)
        df.select(hash(df.columns.map(col): _*).as("h")).agg(sum("h")).collect()
      }
    } catch { case _: Throwable => () }
    val cal = Bench.calibrate()
    val calPar = Bench.calibratePar()
    println(f"KNOBSDIAG cal $cal%.3f cal_par $calPar%.3f")
    // the r12 warm_norm cells (the drifted population) — spill-heavy and
    // spill-free members both, so the diff separates "knob tax" from
    // "everything moved"
    val watch = Seq("l4_cache", "x_ann_ivfpq", "x_ann_bipartite",
      "x_ann_ingest", "x_cluster_cc", "x_knn_join", "x_dedup_minhash",
      "x_stream_join_outer", "x_stream_join_full", "x_embed_dedup",
      "x_jaccard_join", "q1_agg", "q9_product_profit")
    val byName = SparkEntry.queries
    // one untimed JIT pass over the watchlist, then min-of-3 serial warm
    watch.foreach(n => try byName(n)(spark, sfDir).collect()
      catch { case _: Throwable => () })
    watch.foreach { n =>
      val t = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        byName(n)(spark, sfDir).collect()
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"KNOBSDIAG warm $n $t%.4f")
    }
    spark.stop()
  }
}
