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
}
