package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** 2D skyline (Pareto front, minimize both coordinates): the points not
  * DOMINATED by any other — no point with x' <= x AND y' <= y that is
  * strictly smaller in at least one. The multi-objective shortlist
  * primitive (cheapest-earliest, smallest-fastest, ...).
  *
  * The textbook SQL form is a running min over ONE global sort — an
  * unpartitioned window, exactly what dies at 100 TB. This is the
  * distributed decomposition:
  *   1. minimal y per x (one hash aggregate — dominance within a column
  *      is just min),
  *   2. range-partition by x, sort within partitions, one mapPartitions
  *      pass emitting each partition's LOCAL skyline (strict running
  *      min of y) plus, per partition, its final running min,
  *   3. driver folds the P partition minima into an exclusive prefix-min
  *      (P doubles of driver state — the zipWithIndex discipline, never
  *      rows), broadcast back,
  *   4. a local-skyline point survives iff its y is strictly below every
  *      preceding partition's minimum.
  * Steps 2-4 add up to: one range exchange, one narrow pass, one O(P)
  * driver fold — the global sort never happens on one task.
  *
  * Ties: equal (x, y) duplicates collapse to one row (a point does not
  * dominate its twin — both survive as the same output row).
  */
object Skyline {

  /** Pareto front of (xCol, yCol), both minimized. Returns (x, y) rows. */
  def skyline2D(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // nulls and NaNs drop: dominance is undefined against NaN (every
    // comparison is false, so a NaN row would silently survive every
    // filter and pollute the front)
    val pts = df.select(col(xCol).cast("double").as("x"),
      col(yCol).cast("double").as("y"))
      .where(col("x").isNotNull && col("y").isNotNull &&
        !isnan(col("x")) && !isnan(col("y")))
      .groupBy("x").agg(min("y").as("y"))
    val sorted = pts.as[(Double, Double)]
      .repartitionByRange(col("x"))
      .sortWithinPartitions("x")
    // local skyline per partition: strict running min of y in x order
    val local = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      var runMin = Double.PositiveInfinity
      it.flatMap { case (x, y) =>
        if (y < runMin) { runMin = y; Iterator.single((pid, x, y)) }
        else Iterator.empty
      }
    }.toDF("pid", "x", "y")
      .localCheckpoint(true) // two consumers below read ONE evaluation
    // exclusive prefix-min of each partition's best y — P doubles through
    // the driver, never points
    val partMins = local.groupBy("pid").agg(min("y").as("m"))
      .collect().map(r => (r.getInt(0), r.getDouble(1))).sortBy(_._1)
    val prefix = scala.collection.mutable.Map[Int, Double]()
    var acc = Double.PositiveInfinity
    partMins.foreach { case (pid, m) =>
      prefix(pid) = acc
      acc = math.min(acc, m)
    }
    val prefixDf = prefix.toSeq.toDF("pid", "bound")
    local.join(broadcast(prefixDf), "pid")
      .where(col("y") < col("bound"))
      .select("x", "y")
  }
}
