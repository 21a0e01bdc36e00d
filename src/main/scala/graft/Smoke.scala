package graft

import org.apache.spark.sql.SparkSession

/** Dev smoke: replicate the driver's t1 check — a plain session (no extra
  * configs) running SparkEntry.entry on sf0.001, expecting rows > 0.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.ui.enabled", "false")
      // UTC pin (r7 advice): Tables' NTZ->TIMESTAMP cast for events.ts is
      // value-identity only under a UTC session. The driver's own t1 runs
      // on a UTC box either way, but a plain-session entrypoint must not
      // depend on host TZ for correctness.
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    df.show(5, truncate = false)
    println(s"ENTRY_ROWS=$n")
    require(n > 0, "entry() returned no rows")

    // Drive the vega-parity engine API end-to-end: the reference's
    // examples/file_read.rs aggregation re-expressed over graft.engine.
    import spark.implicits._
    val sc = engine.Session(spark)
    val li = Tables(spark, "/root/testdata/sf0.001", "lineitem")
      .select("l_returnflag", "l_linestatus", "l_extendedprice")
      .as[(String, String, Double)]
    val avgByFlag = new engine.Dataflow(li)
      .map { case (rf, ls, price) => ((rf, ls), (price, 1L)) }
      .pairs[(String, String), (Double, Long)]
      .reduceByKey { case ((s1, c1), (s2, c2)) => (s1 + s2, c1 + c2) }
      .map { case ((rf, ls), (s, c)) => (rf, ls, math.round(s / c * 100) / 100.0) }
      .collect()
      .sortBy(t => (t._1, t._2))
    avgByFlag.foreach(t => println(s"ENGINE_AVG=$t"))
    require(avgByFlag.size == 6, "expected 6 (returnflag, linestatus) groups")
    spark.stop()
  }
}
