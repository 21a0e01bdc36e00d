package graft

import org.apache.spark.sql.SparkSession

/** Dev diagnostics main (not part of the driver contract): for each named
  * query, print the formatted physical plan (PLAN=) and/or run it with
  * timing (RUN=). Usage: runMain graft.Scratch [--plan] [--sf DIR] q1 q2...
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    var dir = "/root/testdata/sf0.01"
    var plan = false
    val names = scala.collection.mutable.Buffer[String]()
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--plan" => plan = true
        case "--sf" => dir = args(i + 1); i += 1
        case q => names += q
      }
      i += 1
    }
    for (name <- names) {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, dir)
      if (plan) { println(s"===== PLAN $name ====="); df.explain("formatted") }
      val rows = df.collect()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"===== RUN $name rows=${rows.length} time=$sec%.2fs =====")
      // preview from the already-collected rows — df.show would re-run the
      // full uncached plan a second time
      println(df.columns.mkString("|", "|", "|"))
      rows.take(20).foreach(r => println(r.toSeq.mkString("|", "|", "|")))
    }
    spark.stop()
  }
}
