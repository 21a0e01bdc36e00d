package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** RocksDB state-store backend gates: the provider must engage (not fall
  * back to the heap store), produce output identical to the default
  * provider for both stateful operator families this repo streams
  * (keyed dedup and flatMapGroupsWithState sessionization), and restore
  * session confs after the scoped block. The cross-restart state-reload
  * gate lives in the oracled query (x_stream_dedup_rocksdb, phase-B
  * sentinel contract).
  */
class RocksDbStateSpec extends SparkSpec {

  import spark.implicits._

  private val base = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
  private def ts(min: Long) = new java.sql.Timestamp(base.getTime + min * 60000L)

  /** events with ids 0..n-1 plus duplicate copies of every 7th id. */
  private def dupEvents(n: Int): DataFrame = {
    val uniq = (0 until n).map(i => (i.toLong, ts(i % 240), s"t${i % 3}"))
    val dups = (0 until n by 7).map(i => (i.toLong, ts(i % 240), s"t${i % 3}"))
    (uniq ++ dups).toDF("event_id", "ts", "event_type")
  }

  private def runDedup(input: DataFrame, provider: String): (Seq[(Long, String)], Boolean) = {
    val tmp = java.nio.file.Files.createTempDirectory("rocksspec")
    val src = tmp.resolve("src").toString
    input.coalesce(1).write.parquet(src)
    val qname = "rocks_dedup_" + java.util.UUID.randomUUID().toString.replace("-", "")
    var engaged = false
    StateBackend.withProvider(spark, provider) {
      val stream = spark.readStream.schema(spark.read.parquet(src).schema)
        .parquet(src)
      val q = stream.withWatermark("ts", "30 minutes")
        .dropDuplicatesWithinWatermark("event_id")
        .writeStream.format("memory").queryName(qname)
        .option("checkpointLocation", tmp.resolve("ckpt").toString)
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        engaged = StateBackend.rocksDbEngaged(q)
      } finally q.stop()
    }
    val rows = spark.table(qname).select("event_id", "event_type")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    (rows, engaged)
  }

  test("keyed dedup under RocksDB == default provider, and engagement is detectable") {
    val input = dupEvents(200)
    val (rocks, rocksEngaged) = runDedup(input, StateBackend.RocksDb)
    val (heap, heapEngaged) = runDedup(input, StateBackend.HeapBacked)
    assert(rocksEngaged, "RocksDB provider configured but no rocksdb metrics")
    assert(!heapEngaged, "heap provider reported rocksdb metrics")
    assert(rocks == heap, s"provider outputs differ: rocks=${rocks.size} heap=${heap.size}")
    assert(rocks.size == 200, s"expected 200 unique ids, got ${rocks.size}")
  }

  test("flatMapGroupsWithState sessionization runs on RocksDB and matches batch truth") {
    // 3 users x 2 sessions each (events 10 min apart inside a session,
    // sessions 120 min apart, gap 30 min), far-future sentinel flushes
    val ev = for {
      u <- 0L until 3L; sess <- 0 until 2; i <- 0 until 3
    } yield EventStreams.Event(u, ts(sess * 120 + i * 10), "e", 1.0)
    val withSentinel = ev :+ EventStreams.Event(-1L, ts(100000), "sentinel", 0.0)
    val tmp = java.nio.file.Files.createTempDirectory("rockssess")
    val src = tmp.resolve("src").toString
    withSentinel.toDF().coalesce(1).write.parquet(src)
    val qname = "rocks_sess_" + java.util.UUID.randomUUID().toString.replace("-", "")
    StateBackend.withProvider(spark, StateBackend.RocksDb) {
      val stream = spark.readStream.schema(spark.read.parquet(src).schema)
        .parquet(src).as[EventStreams.Event]
      val q = EventStreams.sessionizeMs(stream, 30 * 60000L, emitOpen = false)
        .writeStream.format("memory").queryName(qname)
        .option("checkpointLocation", tmp.resolve("ckpt").toString)
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        assert(StateBackend.rocksDbEngaged(q), "no rocksdb metrics on fMGWS path")
      } finally q.stop()
    }
    val got = spark.table(qname)
      .where(col("user_id") >= 0)
      .select("user_id", "session_start", "n_events")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)))
      .toSeq.sortBy(x => (x._1, x._2.getTime))
    val want = (for { u <- 0L until 3L; sess <- 0 until 2 }
      yield (u, ts(sess * 120), 3L)).sortBy(x => (x._1, x._2.getTime))
    assert(got == want, s"sessions differ: got=$got")
  }

  test("windowed aggregation and the stream-stream interval join run on RocksDB and match") {
    // completes the backend's operator-family matrix: keyed dedup and
    // fMGWS above, streaming hash-agg and the 4-store interval join here
    val ev = ((0 until 120).map(i => (i.toLong, ts(i * 2),
      if (i % 3 == 0) "purchase" else "click", 10.0 + (i % 7))) :+
      ((999L, ts(100000), "sentinel", 0.0)))
      .toDF("event_id", "ts", "event_type", "value")
      .withColumn("user_id", col("event_id") % 5)
    val tmp = java.nio.file.Files.createTempDirectory("rocksops")
    val src = tmp.resolve("src").toString
    ev.coalesce(1).write.parquet(src)

    def runStream(name: String, mk: org.apache.spark.sql.DataFrame => DataFrame): DataFrame = {
      val qname = s"rocks_${name}_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      StateBackend.withProvider(spark, StateBackend.RocksDb) {
        val stream = spark.readStream.schema(spark.read.parquet(src).schema)
          .parquet(src)
        val q = mk(stream).writeStream.format("memory").queryName(qname)
          .option("checkpointLocation",
            tmp.resolve(s"ckpt_$name").toString)
          .outputMode("append").start()
        try {
          q.processAllAvailable()
          assert(StateBackend.rocksDbEngaged(q), s"no rocksdb metrics on $name")
        } finally q.stop()
      }
      spark.table(qname)
    }

    // windowed agg: every closed window must match the batch twin exactly
    // (the far-future sentinel flushes all real windows; its own window
    // never closes, so it can't appear in append-mode output)
    val aggStream = runStream("agg", df => EventStreams.hourlyCountsCents(df))
    val aggBatch = EventStreams.hourlyCountsCents(
      ev.where(col("event_type") =!= "sentinel"))
    assert(aggStream.exceptAll(aggBatch).isEmpty && aggStream.count() > 0,
      "RocksDB-backed windowed agg diverged from batch truth")

    // interval join: inner click-purchase pairs must match the batch twin
    val joined = runStream("join",
      df => graft.streaming.EventStreams.clickPurchaseJoin(df, windowMinutes = 30)
        .select("p_user", "purchase_ts", "click_ts"))
    val joinedBatch = graft.streaming.EventStreams
      .clickPurchaseJoin(ev, windowMinutes = 30)
      .select("p_user", "purchase_ts", "click_ts")
    assert(joined.count() > 0 &&
      joined.exceptAll(joinedBatch).isEmpty &&
      joinedBatch.exceptAll(joined).isEmpty,
      "RocksDB-backed interval join diverged from batch truth")
  }

  test("withProvider restores prior session confs") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(key)
    StateBackend.withProvider(spark, StateBackend.RocksDb) {
      assert(spark.conf.get(key) == StateBackend.RocksDb)
    }
    assert(spark.conf.getOption(key) == before)
    // nested override restores the OUTER override, not the default
    StateBackend.withProvider(spark, StateBackend.HeapBacked) {
      StateBackend.withProvider(spark, StateBackend.RocksDb) {
        assert(spark.conf.get(key) == StateBackend.RocksDb)
      }
      assert(spark.conf.get(key) == StateBackend.HeapBacked)
    }
    assert(spark.conf.getOption(key) == before)
  }
}
