package graft
import org.apache.spark.sql.SparkSession

/** Benchmark entrypoint: times every SparkEntry query at the given SF.
  *
  * Output contract: ONE machine-readable JSON line
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`
  * printed LAST. The harness that invokes this keeps only the final ~2000
  * characters of stdout, so the official line is kept under 1700 chars: the
  * `queries` map carries the slowest queries (2-decimal seconds) up to that
  * budget, plus `n` (total query count), `omitted` (queries not listed) and
  * `rest` (their summed seconds). The FULL per-query map is printed earlier
  * as `BENCH-FULL` lines and written to target/bench_full.json for humans.
  */
object Bench {

  /** Locale-pinned formatting: the f interpolator uses the JVM default
    * locale, and a comma-decimal locale (de_DE etc.) would print 92,31 —
    * invalid JSON, reintroducing the parsed:null failure this file fixes.
    */
  private[graft] def fmt(pattern: String, d: Double): String =
    String.format(java.util.Locale.ROOT, pattern, Double.box(d))

  /** Build the official line: slowest queries first, packed into `budget`
    * chars. The pack stops at the FIRST entry that doesn't fit, so the
    * kept set is a true prefix of the slowest-sorted list — otherwise a
    * skipped long-named slow query with a shorter fast one appended after
    * it would break the value ≈ sum(queries) + rest invariant the line
    * promises. `warm` carries the second-run times of the slowest queries
    * (repeated-run protocol): a cold-vs-warm gap separates a real plan
    * regression from box noise / first-touch page cache, which r4's
    * single-shot numbers could not. Exposed for BenchLineSpec.
    */
  private[graft] def officialLine(results: Seq[(String, Double)], sfDir: String,
      warm: Seq[(String, Double)] = Nil, budget: Int = 1600): String = {
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    def ent(kv: (String, Double)): String = s""""${kv._1}":${fmt("%.2f", kv._2)}"""
    val bySlowest = results.sortBy(-_._2)
    val head = s"""{"metric":"total","value":${fmt("%.2f", total)},"unit":"sec","n":${results.size},"""
    val warmJson = warm.sortBy(_._1).map(ent).mkString(""""warm":{""", ",", "},")
    val tail0 = s""","sf":"$sfDir"}"""
    var used = head.length + warmJson.length + tail0.length +
      """"queries":{}""".length + 60
    val kept = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    var full = false
    bySlowest.foreach { kv =>
      if (!full) {
        val len = ent(kv).length + 1
        if (used + len <= budget) { kept += kv; used += len } else full = true
      }
    }
    val omitted = results.size - kept.size
    val rest = bySlowest.drop(kept.size).map(_._2).sum
    val qs = kept.sortBy(_._1).map(ent).mkString("{", ",", "}")
    head + warmJson + s""""omitted":$omitted,"rest":${fmt("%.2f", rest)},"queries":$qs""" + tail0
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // benched plans run under the same scale-killer linter as Verify
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: absorb JVM/codegen/scheduler startup AND first-touch
    // file I/O for every table, so per-query numbers measure the queries —
    // not the first query's luck or which query happens to read a table
    // first (the page cache is shared state across the run either way).
    try {
      graft.Tables.names.foreach { t =>
        spark.read.parquet(s"$sfDir/$t.parquet").count()
      }
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy("l_returnflag").count().collect()
    } catch { case _: Throwable => () }
    def run1(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      // collect(), not count(): count() lets Catalyst drop a final ORDER BY
      // (EliminateSorts), undercounting exactly the queries with big sorts
      // relative to what Verify's materialization pays.
      try { fn(spark, sfDir).collect() } catch { case _: Throwable => () }
      (System.nanoTime() - t0) / 1e9
    }
    val byName = SparkEntry.queries
    val results = byName.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> run1(name, fn)
    }
    // Repeated-run protocol: rerun the 10 slowest queries once, warm. A
    // query that is slow cold AND warm has a plan problem; one that is only
    // slow cold hit box noise / first-touch I/O — r4's 2-6x swings on
    // untouched code were unattributable without this second sample.
    val warm = results.sortBy(-_._2).take(10).map { case (name, _) =>
      name -> run1(name, byName(name))
    }
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    // Full-precision detail: one line per query (scrolls out of the tail
    // buffer by design) plus a JSON file for offline inspection.
    results.foreach { case (k, v) => println(s"BENCH-FULL $k ${fmt("%.4f", v)}") }
    warm.foreach { case (k, v) => println(s"BENCH-WARM $k ${fmt("%.4f", v)}") }
    def m(kvs: Seq[(String, Double)]): String =
      kvs.map { case (k, v) => "\"" + k + "\":" + fmt("%.6f", v) }.mkString("{", ",", "}")
    val fullJson = "{\"total\":" + fmt("%.6f", total) + ",\"sf\":\"" + sfDir +
      "\",\"warm\":" + m(warm) + ",\"queries\":" + m(results) + "}"
    try {
      val p = java.nio.file.Paths.get("target", "bench_full.json")
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p, fullJson.getBytes("UTF-8"))
    } catch { case _: Throwable => () }
    val line = officialLine(results, sfDir, warm)
    spark.stop()
    println(line)
  }
}
