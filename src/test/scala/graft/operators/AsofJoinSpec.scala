package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkSpec {

  import spark.implicits._

  private def ts(min: Int) =
    new java.sql.Timestamp(1767225600000L + min * 60000L)

  test("asof backward: latest right row at-or-before, inclusive ties, null when none") {
    val left = Seq(
      (1L, ts(10)),  // after right@5 -> 5's value
      (1L, ts(5)),   // EXACTLY at right@5 -> inclusive match
      (1L, ts(1)),   // before any right row -> null
      (2L, ts(10)))  // key with no right rows at all -> null
      .toDF("k", "ts")
    val right = Seq(
      (1L, ts(5), 50.0),
      (1L, ts(8), 80.0),
      (1L, ts(12), 120.0)) // in the future of every left row -> never matches
      .toDF("k", "ts", "v")
    val got = AsofJoin.asofBackward(left, right, "k", "ts", Seq("v"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), Option(r.get(2)))).toSet
    assert(got == Set(
      (1L, ts(10), Some(80.0)), // 8 is the latest <= 10 (not 12)
      (1L, ts(5), Some(50.0)),  // inclusive
      (1L, ts(1), None),
      (2L, ts(10), None)))
  }

  test("asof backward: matched right row with NULL value yields NULL, not an older value") {
    val left = Seq((1L, ts(3))).toDF("k", "ts")
    val right = Seq(
      (1L, ts(1), Some(10.0)),
      (1L, ts(2), None)) // the true as-of match, value genuinely NULL
      .toDF("k", "ts", "v")
    val got = AsofJoin.asofBackward(left, right, "k", "ts", Seq("v")).collect()
    assert(got.length == 1)
    assert(got(0).isNullAt(2),
      s"expected NULL from the ts=2 match (DuckDB ASOF semantics), got ${got(0)}")
  }

  test("asof backward: multiple value columns come from the SAME right row") {
    val left = Seq((1L, ts(10))).toDF("k", "ts")
    val right = Seq(
      (1L, ts(1), Some(1.0), Option.empty[String]),
      (1L, ts(2), Option.empty[Double], Some("b")))
      .toDF("k", "ts", "v1", "v2")
    val got = AsofJoin.asofBackward(left, right, "k", "ts", Seq("v1", "v2")).collect()(0)
    // the ts=2 row wins for BOTH columns: v1 null, v2 "b" — never a blend
    assert(got.isNullAt(2) && got.getString(3) == "b", got.toString)
  }

  test("asof backward: NULL right ts/key rows never match; NULL left ts/key rows match nothing") {
    val left = Seq(
      (Some(1L), Some(ts(10))),          // normal row — must match right@5, NOT the null-ts row
      (Some(1L), Option.empty[java.sql.Timestamp]), // null left ts -> no right row precedes it
      (Option.empty[Long], Some(ts(10)))) // null left key -> equality matches nothing
      .toDF("k", "ts")
    val right = Seq(
      (Some(1L), Some(ts(5)), 50.0),
      (Some(1L), Option.empty[java.sql.Timestamp], 999.0), // null ts: sorts first unfiltered -> would leak 999 everywhere
      (Option.empty[Long], Some(ts(1)), 888.0))            // null key: would co-partition with null-key left rows
      .toDF("k", "ts", "v")
    val got = AsofJoin.asofBackward(left, right, "k", "ts", Seq("v"))
      .collect().map(r => (Option(r.get(0)), Option(r.get(1)), Option(r.get(2)))).toSet
    assert(got == Set(
      (Some(1L), Some(ts(10)), Some(50.0)),
      (Some(1L), None, None),
      (None, Some(ts(10)), None)), got.toString)
  }

  test("asof backward rejects colliding value column names") {
    val df = Seq((1L, ts(0), 1.0)).toDF("k", "ts", "v")
    val err = intercept[IllegalArgumentException] {
      AsofJoin.asofBackward(df, df, "k", "ts", Seq("v"))
    }
    assert(err.getMessage.contains("collide"))
  }

  test("asof backward keeps every left row exactly once") {
    val left = Seq((1L, ts(3)), (1L, ts(3)), (1L, ts(7))).toDF("k", "ts") // dup left rows kept
    val right = Seq((1L, ts(2), 2.0)).toDF("k", "ts", "v")
    val got = AsofJoin.asofBackward(left, right, "k", "ts", Seq("v"))
    assert(got.count() == 3)
    assert(got.where(col("v") === 2.0).count() == 3)
  }
}
