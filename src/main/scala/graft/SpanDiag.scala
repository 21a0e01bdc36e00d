package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev diagnostics main (not part of the driver contract): decompose
  * x_span_dedup's cost — tokenize-only, gram fingerprinting (md5-per-gram
  * vs a cheap non-portable hash as the floor), and the group-count
  * exchange — to size the portable-fingerprint rework before attempting
  * it. Usage: runMain graft.SpanDiag [sfDir]
  */
object SpanDiag {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf100")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[A](what: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"SPANDIAG $what ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    val toksCol = filter(split(lower(col("text")), " "), x => x =!= "")
    val base = Tables(spark, dir, "documents")
      .select(col("doc_id"), toksCol.as("ts"))
      .where(size(col("ts")) >= 8)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"SPANDIAG docs=${base.count()}")

    t("tokenize_scan")(base.select(sum(size(col("ts")))).collect())
    // current production fingerprint: md5 over the re-concatenated 8-gram
    t("grams_md5")(base.select(explode(expr(
      "transform(sequence(1, size(ts) - 7), i -> " +
        "CAST(conv(substr(md5(concat_ws(' ', slice(ts, i, 8))), 1, 15), 16, 10) AS BIGINT))"))
      .as("g")).agg(expr("bit_xor(g)")).collect())
    // floor: same explode shape, xxhash64 of the gram string (one cheap
    // hash, NOT oracle-portable — diagnostic only)
    t("grams_xxh")(base.select(explode(expr(
      "transform(sequence(1, size(ts) - 7), i -> " +
        "xxhash64(concat_ws(' ', slice(ts, i, 8))))"))
      .as("g")).agg(expr("bit_xor(g)")).collect())
    // per-token md5 then integer polynomial combine (the portable rework
    // candidate: md5 byte volume drops ~7x, concat churn goes away)
    t("grams_tokmd5_poly")(base
      .select(col("doc_id"), expr(
        "transform(ts, x -> pmod(CAST(conv(substr(md5(x), 1, 15), 16, 10) AS BIGINT), 2147483647))")
        .as("th"))
      .select(explode(expr(
        """transform(sequence(1, size(th) - 7), i ->
          |  pmod(th[i-1]*31 + th[i]*37 + th[i+1]*41 + th[i+2]*43 + th[i+3]*47
          |    + th[i+4]*53 + th[i+5]*59 + th[i+6]*61, 2147483647))""".stripMargin))
        .as("g")).agg(expr("bit_xor(g)")).collect())
    // full query shape at the production fingerprint (group + count)
    t("full_md5")(base.select(col("doc_id"), explode(expr(
      "transform(sequence(1, size(ts) - 7), i -> " +
        "CAST(conv(substr(md5(concat_ws(' ', slice(ts, i, 8))), 1, 15), 16, 10) AS BIGINT))"))
      .as("g"))
      .groupBy("g").agg(countDistinct(col("doc_id")).as("nd"))
      .where(col("nd") > 1)
      .agg(count(lit(1)), coalesce(sum(col("nd")), lit(0L))).collect())
    base.unpersist()
    spark.stop()
  }
}
