package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join: points joined to the intervals containing them.
  *
  * Spark plans a bare `p.ts BETWEEN i.start AND i.end` join as a broadcast
  * nested loop (fine only while one side broadcasts) or a cartesian — both
  * the wrong shape at 100 TB. This is the bucket-decomposition method:
  * quantize time into fixed-width buckets, explode each interval to the
  * buckets it covers, bucket the points, EQUI-join on (key, bucket), then
  * filter exact containment and dedupe. The join becomes a hash join whose
  * cost is linear in points + sum(interval lengths)/bucketWidth — the same
  * trick geo joins use for bounding boxes.
  *
  * bucketWidth tunes duplication: intervals explode into
  * ceil(length/width)+1 rows. Pick it near the median interval length so
  * most intervals land in 1-2 buckets.
  */
object RangeJoin {

  /** Join point rows to interval rows sharing `keyCol` with
    * pointTs in [startCol, endCol] (inclusive). Long/epoch columns.
    * Returns all point columns plus `payloadCols` from the interval side
    * (the interval bounds themselves are dropped). Interval-side column
    * names must not collide with point columns — checked up front so the
    * failure is a clear message, not an ambiguous-reference analysis error.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame, keyCol: String,
      pointTsCol: String, startCol: String, endCol: String,
      payloadCols: Seq[String], bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val collisions = (Seq(startCol, endCol) ++ payloadCols)
      .intersect(points.columns.toSeq)
    require(collisions.isEmpty,
      s"interval columns $collisions collide with point columns — rename one side")
    val iv = intervals.select(
      (Seq(col(keyCol), col(startCol), col(endCol)) ++ payloadCols.map(col)): _*)
      .withColumn("__b", explode(sequence(
        floor(col(startCol) / bucketWidth).cast("long"),
        floor(col(endCol) / bucketWidth).cast("long"))))
    val pt = points
      .withColumn("__b", floor(col(pointTsCol) / bucketWidth).cast("long"))
    pt.join(iv, Seq(keyCol, "__b"))
      .where(col(pointTsCol) >= col(startCol) && col(pointTsCol) <= col(endCol))
      .drop("__b", startCol, endCol)
  }
}
