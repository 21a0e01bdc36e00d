package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev decomposition for x_triangles' scale curve (not part of the driver
  * contract): times the chain-fixture construction (global-window lead
  * over sorted doc ids — a ONE-task sort) separately from the
  * compact-forward operator stages, at each given corpus dir.
  * Usage: runMain graft.TriDiag dir1 [dir2 ...]
  */
object TriDiag {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(what: String)(body: => Long): Long = {
      val t0 = System.nanoTime()
      val n = body
      println(f"TRIDIAG $what n=$n time=${(System.nanoTime() - t0) / 1e9}%.2fs")
      n
    }
    for (dir <- args) {
      println(s"===== $dir =====")
      val ids = Tables(spark, dir, "documents").select(col("doc_id").as("id"))
      time(s"warm-ids")(ids.count())
      val w = org.apache.spark.sql.expressions.Window.orderBy("id")
      def edges() = {
        val nbrs = ids
          .withColumn("n1", lead(col("id"), 1).over(w))
          .withColumn("n2", lead(col("id"), 2).over(w))
        nbrs.where(col("n1").isNotNull)
          .select(col("id").as("src"), col("n1").as("dst"))
          .unionByName(nbrs.where(col("n2").isNotNull)
            .select(col("id").as("src"), col("n2").as("dst")))
      }
      for (_ <- 1 to 2) time("fixture-edges-count")(edges().count())
      // operator stages on a PINNED edge frame so stage costs don't
      // re-pay the fixture window
      val e = edges().localCheckpoint(true)
      val und = e.select(least(col("src"), col("dst")).as("lo"),
        greatest(col("src"), col("dst")).as("hi"))
        .where(col("lo") =!= col("hi"))
        .dropDuplicates("lo", "hi")
      for (_ <- 1 to 2) time("canon-dedup")(und.count())
      val undP = und.localCheckpoint(true)
      val deg = undP.select(col("lo").as("n"))
        .unionAll(undP.select(col("hi").as("n")))
        .groupBy("n").agg(count(lit(1)).as("d"))
      for (_ <- 1 to 2) time("degrees")(deg.count())
      for (_ <- 1 to 2) time("full-operator-on-pinned-edges")(
        graft.operators.Triangles.triangles(e).count())
      for (_ <- 1 to 2) time("full-query") {
        SparkEntry.queries("x_triangles")(spark, dir).collect()
        1L
      }
    }
    spark.stop()
  }
}
