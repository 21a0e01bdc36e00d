package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev diagnostic for the left-outer stream-stream join (not part of the
  * driver contract): runs x_stream_join_outer's harness and prints the
  * per-purchase rows Spark emitted vs the batch LEFT JOIN, to locate
  * which outer rows fail to flush.
  */
object StreamJoinDiag {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tmp = java.nio.file.Files.createTempDirectory("sjd")
    val src = tmp.resolve("src").toString
    val ev = Tables(spark, dir, "events").where(col("user_id") < 40)
      .select(col("user_id"), col("ts").cast("timestamp").as("ts"), col("event_type"))
    val bounds = ev.agg(
      expr("approx_percentile(unix_millis(ts), 0.5)"), max(unix_millis(col("ts")))).first()
    val (mid, maxMs) = (bounds.getLong(0), bounds.getLong(1))
    ev.where(unix_millis(col("ts")) < mid).coalesce(1).write.mode("overwrite").parquet(src)
    Thread.sleep(1100)
    ev.where(unix_millis(col("ts")) >= mid).coalesce(1).write.mode("append").parquet(src)
    Thread.sleep(1100)
    import spark.implicits._
    Seq((-1L, new java.sql.Timestamp(maxMs + 10800000L), "sentinel"))
      .toDF("user_id", "ts", "event_type").coalesce(1).write.mode("append").parquet(src)
    Thread.sleep(1100)
    Seq((-1L, new java.sql.Timestamp(maxMs + 21600000L), "sentinel"))
      .toDF("user_id", "ts", "event_type").coalesce(1).write.mode("append").parquet(src)
    Thread.sleep(1100)
    Seq((-1L, new java.sql.Timestamp(maxMs + 32400000L), "sentinel"))
      .toDF("user_id", "ts", "event_type").coalesce(1).write.mode("append").parquet(src)
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
    val joined = graft.streaming.EventStreams.clickPurchaseLeftJoin(stream, 30)
    val q = joined.writeStream.format("memory").queryName("sjd")
      .option("checkpointLocation", tmp.resolve("ckpt").toString)
      .outputMode("append").start()
    q.processAllAvailable()
    q.recentProgress.foreach(p =>
      println(s"SJD batch=${p.batchId} rows=${p.numInputRows} out=${p.sink.numOutputRows} wm=${p.eventTime.get("watermark")}"))
    q.stop()
    val got = spark.table("sjd").where(col("p_type") === "purchase")
      .select(col("p_user"), col("purchase_ts")).distinct()
    val want = ev.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"))
    val missing = want.exceptAll(got)
    println(s"SJD mid=${new java.sql.Timestamp(mid)} max=${new java.sql.Timestamp(maxMs)}")
    println(s"SJD purchases=${want.count()} emitted=${got.count()} missing=${missing.count()}")
    missing.orderBy("p_user", "purchase_ts").show(50, false)
    spark.stop()
  }
}
