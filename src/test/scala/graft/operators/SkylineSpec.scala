package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkylineSpec extends SparkSpec {

  import spark.implicits._

  private def brute(pts: Seq[(Double, Double)]): Set[(Double, Double)] = {
    val d = pts.distinct
    d.filter { case (x, y) =>
      !d.exists { case (a, b) =>
        a <= x && b <= y && (a < x || b < y)
      }
    }.toSet
  }

  private def run(pts: Seq[(Double, Double)]): Set[(Double, Double)] =
    Skyline.skyline2D(pts.toDF("x", "y"), "x", "y")
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSet

  test("skyline equals brute-force dominance on seeded random points") {
    val rnd = new scala.util.Random(13)
    val pts = Seq.fill(500)((rnd.nextInt(60).toDouble, rnd.nextInt(60).toDouble))
    assert(run(pts) === brute(pts))
    assert(brute(pts).nonEmpty)
  }

  test("staircase survives whole; dominated interior points drop") {
    val stairs = Seq((1.0, 5.0), (2.0, 4.0), (3.0, 3.0), (4.0, 2.0), (5.0, 1.0))
    val interior = Seq((3.0, 4.0), (4.0, 5.0), (2.0, 5.0))
    assert(run(stairs ++ interior) === stairs.toSet)
  }

  test("duplicates collapse; same-x keeps only the minimal y") {
    val pts = Seq((1.0, 1.0), (1.0, 1.0), (1.0, 3.0), (2.0, 0.5), (2.0, 2.0))
    assert(run(pts) === Set((1.0, 1.0), (2.0, 0.5)))
  }

  test("single point and empty input") {
    assert(run(Seq((7.0, 7.0))) === Set((7.0, 7.0)))
    assert(run(Seq.empty[(Double, Double)]) === Set.empty[(Double, Double)])
  }

  // ---- skylineGrid (d>2, maximize-all) ----

  /** Brute-force maximize-dominance front over the multiset: a row drops
    * iff some other ROW is >= in every dim and > in one — exact duplicates
    * never dominate each other, so all copies survive (the grid's tie
    * contract).
    */
  private def bruteMaxIds(pts: Seq[(Long, Seq[Double])]): Set[Long] =
    pts.filter { case (_, v) =>
      !pts.exists { case (_, w) =>
        v.indices.forall(k => w(k) >= v(k)) &&
          v.indices.exists(k => w(k) > v(k))
      }
    }.map(_._1).toSet

  private def runGrid(pts: Seq[(Long, Seq[Double])], d: Int,
      gridBits: Int = 2): Set[Long] = {
    val df = pts.map { case (id, v) => (id, v(0), v(1), v(2)) }
      .toDF("id", "a", "b", "c")
    assert(d == 3)
    Skyline.skylineGrid(df, "id", Seq("a", "b", "c"), gridBits)
      .collect().map(_.getLong(0)).toSet
  }

  test("grid skyline equals brute-force dominance on seeded random 3D points") {
    val rnd = new scala.util.Random(29)
    val pts = (0 until 400).map(i =>
      (i.toLong, Seq.fill(3)(rnd.nextInt(40).toDouble)))
    val got = runGrid(pts, 3)
    assert(got === bruteMaxIds(pts))
    assert(got.nonEmpty && got.size < pts.size)
  }

  test("grid prunes cells on correlated data (effectiveness gate)") {
    // clustered-on-the-diagonal data: the top corner cell dominates every
    // cell two steps down in all dims, so the driver DP must kill a
    // material fraction of occupied cells without reading a row
    val rnd = new scala.util.Random(31)
    val pts = (0 until 2000).map { i =>
      val base = rnd.nextDouble() * 90
      (i.toLong, Seq.fill(3)(base + rnd.nextDouble() * 10))
    }
    val got = runGrid(pts, 3)
    assert(got === bruteMaxIds(pts))
    val (pruned, occupied) = Skyline.lastPrunedCells.get()
    assert(occupied > 0)
    assert(pruned >= occupied / 3,
      s"grid pruned only $pruned of $occupied occupied cells on correlated data")
  }

  test("anti-correlated worst case: every distinct point is on the front") {
    // all points on the plane a+b+c = 100: nothing dominates anything
    val rnd = new scala.util.Random(37)
    val pts = (0 until 200).map { i =>
      val a = rnd.nextInt(50).toDouble
      val b = rnd.nextInt(50).toDouble
      (i.toLong, Seq(a, b, 100.0 - a - b))
    }
    assert(runGrid(pts, 3) === pts.map(_._1).toSet)
  }

  test("grid skyline: exact duplicates all survive; null/NaN rows drop") {
    val dup = Seq((1L, Seq(5.0, 5.0, 5.0)), (2L, Seq(5.0, 5.0, 5.0)),
      (3L, Seq(1.0, 1.0, 1.0)))
    assert(runGrid(dup, 3) === Set(1L, 2L))
    val withBad = Seq((1L, 3.0, 3.0, 3.0), (2L, Double.NaN, 9.0, 9.0))
      .toDF("id", "a", "b", "c")
      .union(Seq((3L, 9.0, 9.0, 9.0)).toDF("id", "a", "b", "c")
        .select(col("id"), col("a"), col("b"),
          when(col("c") < 0, col("c")).as("c"))) // null c
    val got = Skyline.skylineGrid(withBad, "id", Seq("a", "b", "c"))
      .collect().map(_.getLong(0)).toSet
    // NaN and null rows are excluded entirely — they neither survive nor
    // shield the dominated (1) from... nothing: only (1) remains
    assert(got === Set(1L))
  }

  test("grid cap: g^d over 65536 cells is rejected up front") {
    val df = Seq((1L, 1.0, 1.0, 1.0)).toDF("id", "a", "b", "c")
      .withColumn("d", col("a")).withColumn("e", col("a"))
      .withColumn("f", col("a"))
    val ex = intercept[IllegalArgumentException] {
      Skyline.skylineGrid(df, "id", Seq("a", "b", "c", "d", "e", "f"), 4)
    }
    assert(ex.getMessage.contains("65536"))
  }
}
