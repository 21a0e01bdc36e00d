package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Degree-ordered compact-forward triangle enumeration vs brute force on
  * seeded random graphs (including a hub — the "last reducer" shape the
  * orientation exists to defuse).
  */
class TrianglesSpec extends SparkSpec {

  private def bruteForce(edges: Seq[(Long, Long)]): Set[(Long, Long, Long)] = {
    val und = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .filter { case (a, b) => a != b }.toSet
    val nodes = und.map(_._1).toSeq.sorted
    (for {
      a <- nodes; b <- nodes if a < b && und((a, b))
      c <- nodes if b < c && und((b, c)) && und((a, c))
    } yield (a, b, c)).toSet
  }

  private def run(edges: Seq[(Long, Long)]): Set[(Long, Long, Long)] = {
    import spark.implicits._
    Triangles.triangles(edges.toDF("src", "dst"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  test("random graph matches brute force") {
    val rnd = new scala.util.Random(7)
    val n = 40
    val edges = for {
      a <- 0L until n; b <- (a + 1) until n if rnd.nextDouble() < 0.15
    } yield (a, b)
    val want = bruteForce(edges)
    assert(run(edges) === want)
    assert(want.nonEmpty, "degenerate fixture")
  }

  test("hub graph (star + rim) matches brute force; dup/reversed input tolerated") {
    // hub 0 connected to all; rim cycle 1-2-...-12-1: triangles are
    // exactly (0, i, i+1) — every wedge passes through the hub
    val rim = (1L to 12L).map(i => (i, if (i == 12L) 1L else i + 1))
    val star = (1L to 12L).map(i => (0L, i))
    val noisy = (rim ++ star) ++ rim.map(_.swap) ++ star.take(3) // dups + reversed
    val want = bruteForce(rim ++ star)
    assert(run(noisy) === want)
    assert(want.size === 12)
  }

  test("triangle-free chain yields empty result") {
    val chain = (0L until 20L).map(i => (i, i + 1))
    assert(run(chain).isEmpty)
  }
}
