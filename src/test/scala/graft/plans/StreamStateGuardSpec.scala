package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** StreamStateGuard gates: the no-watermark dropDuplicates shape (state
  * grows every batch, no eviction path) must be flagged within
  * `minBatches` batches; the watermarked twin of the same stream must
  * stay clean; assertClean throws on findings. The listener itself is
  * registered session-wide via spark.sql.streaming.streamingQueryListeners
  * (SparkSpec builder), so these tests also prove the registration path.
  */
class StreamStateGuardSpec extends SparkSpec {

  import spark.implicits._

  private val base = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")

  /** Run a dedup stream over `nBatches` single-file batches of fresh keys,
    * watermarked or not; returns findings recorded during the run.
    */
  private def run(watermarked: Boolean,
      nBatches: Int): Seq[StreamStateGuard.Finding] = {
    val tmp = java.nio.file.Files.createTempDirectory("sguard")
    val src = tmp.resolve("src").toString
    def batch(k: Int) = (0 until 50).map(i =>
      (k * 1000L + i, new java.sql.Timestamp(base.getTime + (k * 50 + i) * 60000L)))
      .toDF("event_id", "ts")
    batch(0).coalesce(1).write.parquet(src)
    StreamStateGuard.clear()
    spark.conf.set("spark.graft.streamGuard.minBatches", "3")
    spark.conf.set("spark.graft.streamGuard.minRows", "1")
    try {
      val stream = spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
      val deduped =
        if (watermarked)
          stream.withWatermark("ts", "10 minutes")
            .dropDuplicatesWithinWatermark("event_id")
        else stream.dropDuplicates("event_id")
      val qname = "sguard_" + java.util.UUID.randomUUID().toString.replace("-", "")
      val q = deduped.writeStream.format("memory").queryName(qname)
        .option("checkpointLocation", tmp.resolve("ckpt").toString)
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        (1 until nBatches).foreach { k =>
          batch(k).coalesce(1).write.mode("append").parquet(src)
          q.processAllAvailable()
        }
      } finally q.stop()
      StreamStateGuard.recent()
    } finally {
      spark.conf.unset("spark.graft.streamGuard.minBatches")
      spark.conf.unset("spark.graft.streamGuard.minRows")
      StreamStateGuard.clear()
    }
  }

  test("no-watermark dedup: state grows every batch and is flagged") {
    val findings = run(watermarked = false, nBatches = 6)
    assert(findings.nonEmpty, "unbounded dedup state was not flagged")
    assert(findings.head.rows >= 150, s"flagged too early: ${findings.head}")
  }

  test("watermarked dedup over the same stream stays clean") {
    // event time marches forward batch to batch, so the watermark advances
    // and state for old keys is evicted — no streak can form
    val findings = run(watermarked = true, nBatches = 6)
    assert(findings.isEmpty, s"false positive on bounded state: $findings")
  }

  test("withThresholds scopes by query-name prefix") {
    // No session conf set: the 1M-row default can never fire on 50-row
    // batches, so any finding here comes from the override alone — and
    // the override must ignore streams whose name misses the prefix.
    def leaky(prefix: String): Seq[StreamStateGuard.Finding] = {
      val tmp = java.nio.file.Files.createTempDirectory("sguard3")
      val src = tmp.resolve("src").toString
      def batch(k: Int) = (0 until 50).map(i =>
        (k * 1000L + i, new java.sql.Timestamp(base.getTime + i * 1000L)))
        .toDF("event_id", "ts")
      batch(0).coalesce(1).write.parquet(src)
      StreamStateGuard.clear()
      val stream = spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
      val q = stream.dropDuplicates("event_id")
        .writeStream.format("memory")
        .queryName(prefix + java.util.UUID.randomUUID().toString.replace("-", ""))
        .option("checkpointLocation", tmp.resolve("ckpt").toString)
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        (1 until 6).foreach { k =>
          batch(k).coalesce(1).write.mode("append").parquet(src)
          q.processAllAvailable()
        }
      } finally q.stop()
      val out = StreamStateGuard.recent()
      StreamStateGuard.clear()
      out
    }
    StreamStateGuard.withThresholds("scoped_", minBatches = 3, minRows = 1) {
      assert(leaky("scoped_").nonEmpty,
        "override did not apply to a matching stream name")
      assert(leaky("other_").isEmpty,
        "override leaked onto a non-matching stream name")
    }
  }

  test("withThresholds refuses nested/concurrent use instead of clobbering") {
    // the single JVM-global override slot used to be silently clobbered
    // by a nested call, whose finally block then de-scoped the OUTER
    // override mid-flight (r13 advice) — now the inner call throws
    // before touching the slot, and the outer override survives it
    StreamStateGuard.withThresholds("outer_", minBatches = 3, minRows = 1) {
      assertThrows[IllegalStateException](
        StreamStateGuard.withThresholds("inner_", 1, 1)(()))
    }
    // slot released after the outer body: a fresh override is accepted
    StreamStateGuard.withThresholds("after_", minBatches = 3, minRows = 1)(())
  }

  test("terminatedSeen: false for unknown runs, true once the run ends") {
    assert(!StreamStateGuard.terminatedSeen("no-such-run"))
    val tmp = java.nio.file.Files.createTempDirectory("sguard4")
    val src = tmp.resolve("src").toString
    (0 until 30).map(i => (i.toLong,
      new java.sql.Timestamp(base.getTime + i * 1000L)))
      .toDF("event_id", "ts").coalesce(1).write.parquet(src)
    val stream = spark.readStream.schema(spark.read.parquet(src).schema)
      .parquet(src)
    val q = stream.withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
      .writeStream.format("memory")
      .queryName("sguard_term_" +
        java.util.UUID.randomUUID().toString.replace("-", ""))
      .option("checkpointLocation", tmp.resolve("ckpt").toString)
      .outputMode("append").start()
    val runId = q.runId.toString
    try q.processAllAvailable() finally q.stop()
    // FIFO listener bus: the terminated event lands after all progress —
    // poll to the same 5s deadline the production gate uses
    val deadline = System.nanoTime() + 5000000000L
    while (!StreamStateGuard.terminatedSeen(runId) &&
      System.nanoTime() < deadline) Thread.sleep(50)
    assert(StreamStateGuard.terminatedSeen(runId),
      "terminated event not observed within 5s of q.stop()")
  }

  test("malformed guard conf degrades to defaults, not silence") {
    // '"maybe".toBoolean' used to throw inside the listener callback —
    // which Spark swallows — so one bad conf value silently disabled the
    // guard with no finding and no signal. Now a malformed value warns
    // once and falls back to its default (enabled=true here), and the
    // guard still fires under the valid thresholds run() sets.
    spark.conf.set("spark.graft.streamGuard.enabled", "maybe")
    try {
      val findings = run(watermarked = false, nBatches = 6)
      assert(findings.nonEmpty, "guard muted by a malformed enabled conf")
    } finally spark.conf.unset("spark.graft.streamGuard.enabled")
  }

  test("assertClean throws when a finding is recorded") {
    StreamStateGuard.clear()
    run(watermarked = false, nBatches = 6)
    // run() clears on exit — re-run the cheap positive to populate
    val tmp = java.nio.file.Files.createTempDirectory("sguard2")
    val src = tmp.resolve("src").toString
    (0 until 5).foreach { k =>
      (0 until 30).map(i => (k * 100L + i,
        new java.sql.Timestamp(base.getTime + i * 1000L)))
        .toDF("event_id", "ts")
        .coalesce(1).write.mode("append").parquet(src)
    }
    StreamStateGuard.clear()
    spark.conf.set("spark.graft.streamGuard.minBatches", "3")
    spark.conf.set("spark.graft.streamGuard.minRows", "1")
    try {
      val stream = spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
      val q = stream.dropDuplicates("event_id")
        .writeStream.format("memory")
        .queryName("sguard_gate_" +
          java.util.UUID.randomUUID().toString.replace("-", ""))
        .option("checkpointLocation", tmp.resolve("ckpt").toString)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      assertThrows[IllegalStateException](StreamStateGuard.assertClean())
    } finally {
      spark.conf.unset("spark.graft.streamGuard.minBatches")
      spark.conf.unset("spark.graft.streamGuard.minRows")
      StreamStateGuard.clear()
    }
  }
}
