package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {

  import spark.implicits._

  test("point-in-interval: inclusive bounds, multi-bucket intervals, no dup pairs") {
    val points = Seq(
      (1L, 100L),  // inside [50, 250]
      (1L, 50L),   // exactly at start -> inclusive
      (1L, 250L),  // exactly at end -> inclusive
      (1L, 251L),  // just outside
      (2L, 100L))  // key with no intervals
      .toDF("k", "pt")
    // interval spans buckets [0..2] at width 100 — a matching point must
    // still produce exactly ONE output row (its own bucket matches once)
    val intervals = Seq((1L, 50L, 250L, "w1")).toDF("k", "s", "e", "tag")
    val got = RangeJoin.pointInInterval(points, intervals,
      "k", "pt", "s", "e", Seq("tag"), bucketWidth = 100L)
      .select("k", "pt", "tag").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(got.length == got.distinct.length, "duplicate pairs emitted")
    assert(got.toSet == Set((1L, 100L, "w1"), (1L, 50L, "w1"), (1L, 250L, "w1")))
  }

  test("overlapping intervals each match; disjoint ones don't") {
    val points = Seq((1L, 120L)).toDF("k", "pt")
    val intervals = Seq(
      (1L, 100L, 200L, "a"),
      (1L, 110L, 130L, "b"),
      (1L, 200L, 300L, "c")).toDF("k", "s", "e", "tag")
    val got = RangeJoin.pointInInterval(points, intervals,
      "k", "pt", "s", "e", Seq("tag"), bucketWidth = 50L)
      .select("tag").collect().map(_.getString(0)).sorted.toSeq
    assert(got == Seq("a", "b"))
  }

  test("rejects interval columns that collide with point columns") {
    val points = Seq((1L, 1L, "x")).toDF("k", "pt", "tag")
    val intervals = Seq((1L, 0L, 2L, "y")).toDF("k", "s", "e", "tag")
    val err = intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(points, intervals, "k", "pt", "s", "e",
        Seq("tag"), 10L)
    }
    assert(err.getMessage.contains("collide"))
  }

  test("negative timestamps bucket correctly (floor, not truncate-toward-zero)") {
    val points = Seq((1L, -150L)).toDF("k", "pt")
    val intervals = Seq((1L, -200L, -100L, "neg")).toDF("k", "s", "e", "tag")
    val got = RangeJoin.pointInInterval(points, intervals,
      "k", "pt", "s", "e", Seq("tag"), bucketWidth = 100L)
    assert(got.count() == 1)
  }

  test("intervalOverlap equals brute force; exactly-once across shared buckets") {
    // seeded random intervals over 3 keys, lengths spanning 0-10 buckets
    val rnd = new scala.util.Random(7)
    def ivs(n: Int, tag: String) = (0 until n).map { i =>
      val k = rnd.nextInt(3).toLong
      val s = rnd.nextInt(1000).toLong
      (k, s, s + rnd.nextInt(500).toLong, s"$tag$i")
    }
    val l = ivs(60, "L").toDF("k", "ls", "le", "ltag")
    val r = ivs(60, "R").toDF("k", "rs", "re", "rtag")
    val got = RangeJoin.intervalOverlap(l, r, "k", "ls", "le", "rs", "re",
      bucketWidth = 50L)
      .select("ltag", "rtag").collect()
      .map(x => (x.getString(0), x.getString(1))).toSeq
    val want = l.join(r, Seq("k"))
      .where(col("ls") <= col("re") && col("rs") <= col("le"))
      .select("ltag", "rtag").collect()
      .map(x => (x.getString(0), x.getString(1))).toSeq
    assert(got.length === got.distinct.length,
      "a pair was emitted more than once despite sharing several buckets")
    assert(got.toSet === want.toSet)
    assert(want.nonEmpty)
  }

  test("intervalOverlap: touching endpoints overlap (closed intervals)") {
    val l = Seq((1L, 0L, 100L, "a")).toDF("k", "ls", "le", "ltag")
    val r = Seq((1L, 100L, 200L, "b"), (1L, 101L, 200L, "c"))
      .toDF("k", "rs", "re", "rtag")
    val got = RangeJoin.intervalOverlap(l, r, "k", "ls", "le", "rs", "re", 64L)
      .select("rtag").collect().map(_.getString(0)).toSeq
    assert(got === Seq("b"))
  }
}
