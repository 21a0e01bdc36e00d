package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev diagnostic (not part of the driver contract): proves the RocksDB
  * state store provider loads its native library in this container,
  * engages for a stateful streaming query (rocksdb* custom metrics
  * present), and reloads state across a stop/start restart with
  * changelog checkpointing enabled. Run before wiring the real
  * x_stream_dedup_rocksdb query.
  */
object RocksDiag {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val tmp = java.nio.file.Files.createTempDirectory("rocksdiag")
    val src = tmp.resolve("src").toString
    val out = tmp.resolve("out").toString
    val ckpt = tmp.resolve("ckpt").toString

    // phase A: 100 unique keys, ts spread over 2 hours
    val base = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def mk(ids: Seq[Long], offMin: Long) = ids.map(i =>
      (i, new java.sql.Timestamp(base.getTime + (i % 120 + offMin) * 60000L), s"t${i % 3}"))
      .toDF("event_id", "ts", "event_type")
    mk(0L until 100L, 0).coalesce(1).write.mode("overwrite").parquet(src)

    def runPhase(tag: String): Unit = {
      val stream = spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
      val q = stream.withWatermark("ts", "30 minutes")
        .dropDuplicatesWithinWatermark("event_id")
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).outputMode("append").start()
      try {
        q.processAllAvailable()
        val prog = q.lastProgress
        if (prog != null && prog.stateOperators.nonEmpty) {
          val keys = prog.stateOperators(0).customMetrics.keySet()
          val it = keys.iterator(); var rocks = List.empty[String]
          while (it.hasNext) { val k = it.next(); if (k.startsWith("rocksdb")) rocks ::= k }
          println(s"PHASE $tag rocksdb-metrics=${rocks.size} sample=${rocks.take(3)}")
        } else println(s"PHASE $tag no progress/stateOperators")
      } finally q.stop()
      println(s"PHASE $tag rows-out=${spark.read.parquet(out).count()}")
    }
    runPhase("A")
    // phase B: duplicates of keys 90-99 (recent, inside watermark horizon —
    // only reloaded STATE can drop them) + one fresh key far in the future
    val dup = mk(90L until 100L, 0)
    val fresh = Seq((999L, new java.sql.Timestamp(base.getTime + 600 * 60000L), "sentinel"))
      .toDF("event_id", "ts", "event_type")
    dup.unionByName(fresh).coalesce(1).write.mode("append").parquet(src)
    runPhase("B")
    val n = spark.read.parquet(out).count()
    println(s"FINAL rows=$n expected=101 (100 unique + 1 fresh; 10 in-horizon dups dropped by reloaded state)")
    spark.stop()
  }
}
