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

  /** Interval-OVERLAP join: (left, right) interval pairs sharing `keyCol`
    * whose closed intervals intersect (ls <= re AND rs <= le) — the
    * sessions-vs-sessions / attribution-window shape pointInInterval can't
    * express. Same bucket decomposition on BOTH sides, equi-join on
    * (key, bucket), exact overlap filter — and each qualifying pair is
    * emitted exactly ONCE without a pair-dedup shuffle: a pair sharing k
    * buckets is kept only in the bucket containing max(ls, rs), the
    * overlap's left edge, which lies in exactly one bucket (the standard
    * spatial-join report-once trick; a dropDuplicates here would be a
    * pair-stream-sized exchange for nothing).
    *
    * All four bound columns must be Long (epoch units chosen by the
    * caller); left/right column names must not collide except `keyCol`.
    * Returns every left + right column (bounds included — overlap length
    * is the caller's one-liner).
    */
  def intervalOverlap(left: DataFrame, right: DataFrame, keyCol: String,
      lStartCol: String, lEndCol: String, rStartCol: String, rEndCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val collisions = right.columns.toSeq.intersect(left.columns.toSeq)
      .filterNot(_ == keyCol)
    require(collisions.isEmpty,
      s"right columns $collisions collide with left columns — rename one side")
    def bucketed(df: DataFrame, s: String, e: String) =
      df.withColumn("__b", explode(sequence(
        floor(col(s) / bucketWidth).cast("long"),
        floor(col(e) / bucketWidth).cast("long"))))
    bucketed(left, lStartCol, lEndCol)
      .join(bucketed(right, rStartCol, rEndCol), Seq(keyCol, "__b"))
      .where(col(lStartCol) <= col(rEndCol) &&
        col(rStartCol) <= col(lEndCol) &&
        col("__b") === floor(greatest(col(lStartCol), col(rStartCol))
          / bucketWidth).cast("long"))
      .drop("__b")
  }
}
