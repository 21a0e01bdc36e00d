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
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    df.show(5, truncate = false)
    println(s"ENTRY_ROWS=$n")
    require(n > 0, "entry() returned no rows")
    spark.stop()
  }
}
