package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — for each left row, the LATEST right row with
  * the same key and right.ts <= left.ts. The feature-correctness primitive
  * of training-data pipelines: "the value of X as the model would have seen
  * it at event time", with no future leakage.
  *
  * Spark has no asof join; the naive formulations are both scale-broken:
  * a range-condition join explodes to all pairs before filtering, and a
  * per-key subquery recomputes the right side per left row. This is the
  * union-window method (preference (a) of the builder brief — compose
  * existing ops): tag the sides, union them, and carry the right side's
  * values forward with `last(ignoreNulls) OVER (PARTITION BY key ORDER BY
  * ts, side ROWS UNBOUNDED PRECEDING)`. ONE shuffle on the key, memory per
  * task O(1) (running value, not a buffered group), skew bounded by rows
  * per key — the same cost as a groupBy over the union.
  *
  * Inclusive semantics (right.ts == left.ts matches) — sides are ordered
  * (ts, side) with right=0 before left=1, matching DuckDB's
  * `ASOF JOIN ... ON l.ts >= r.ts` (the oracle for x_asof_join). If the
  * right side has several rows at one (key, ts), the last in window order
  * wins — dedupe the right side first for deterministic output.
  */
object AsofJoin {

  /** Left as-of join. `valueCols` are the right-side columns to carry; they
    * must not collide with left column names. Returns all left columns plus
    * the carried values (null when no right row precedes the left row).
    */
  def asofBackward(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(valueCols.intersect(leftCols).isEmpty,
      s"right value columns ${valueCols.intersect(leftCols)} collide with left side")
    // The carried payload is ONE struct per right row, never-null on right
    // rows even when every value inside is null — so a matched right row
    // with a NULL value yields NULL (DuckDB ASOF semantics), not a stale
    // older value, and multiple valueCols always come from the SAME row.
    val l = left.withColumn("__side", lit(1))
      .withColumn("__rv", lit(null).cast(
        org.apache.spark.sql.types.StructType(valueCols.map(c => right.schema(c)))))
      .select((leftCols.map(col) :+ col("__side")) :+ col("__rv"): _*)
    // A right row with a NULL key or NULL ts can never satisfy the join
    // predicate (key equality + ts range both reject NULL) — but unfiltered
    // it WOULD pollute the window: NULLs sort first in ascending order, so a
    // NULL-ts right row would carry its values to every left row of its key,
    // and NULL-key rows would co-partition with NULL-key left rows. Left-side
    // NULLs need no filter: a NULL-ts left row sorts before every surviving
    // right row and a NULL-key left row shares its partition only with other
    // left rows, so both carry the correct empty match.
    val r = right
      .where(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .withColumn("__rv", struct(valueCols.map(col): _*))
      .select(
        (Seq(col(keyCol), col(tsCol), lit(0).as("__side"), col("__rv")) ++
          leftCols.filterNot(Seq(keyCol, tsCol).contains)
            .map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .withColumn("__rv", last(col("__rv"), ignoreNulls = true).over(w))
    valueCols.foldLeft(carried) { (df, c) =>
      df.withColumn(c, col("__rv").getField(c))
    }.where(col("__side") === 1).drop("__side", "__rv")
  }
}
