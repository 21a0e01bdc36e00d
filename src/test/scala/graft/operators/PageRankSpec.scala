package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PageRankSpec extends SparkSpec {

  test("star graph reaches its closed form (spokes constant, hub stable)") {
    import spark.implicits._
    // k spokes all point at the hub; the hub is dangling (mass dropped —
    // the documented convention). Spokes receive nothing, so from sweep 1
    // their rank is exactly the teleport term s = (1-d)/N; the hub
    // stabilizes at (1-d)/N + d*k*s from sweep 2.
    val k = 9
    val n = k + 1
    val d = 0.85
    val edges = (1 to k).map(i => (i.toLong, 0L)).toDF("src", "dst")
    val ranks = PageRank.run(edges, iterations = 5, damping = d)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val s = (1.0 - d) / n
    val hub = (1.0 - d) / n + d * (k * (s / 1.0))
    for (i <- 1 to k)
      assert(math.abs(ranks(i.toLong) - s) < 1e-12, s"spoke $i: ${ranks(i.toLong)}")
    assert(math.abs(ranks(0L) - hub) < 1e-9, s"hub: ${ranks(0L)} want $hub")
  }

  test("two-cycle is uniform; rank ordering follows in-degree on a lollipop") {
    import spark.implicits._
    val two = Seq((0L, 1L), (1L, 0L)).toDF("src", "dst")
    val r2 = PageRank.run(two, iterations = 8).collect()
      .map(r => r.getDouble(1))
    assert(math.abs(r2(0) - 0.5) < 1e-9 && math.abs(r2(1) - 0.5) < 1e-9)
    // chain 2 -> 1 -> 0 and 3 -> 0: node 0 has in-degree 2 and must
    // outrank 1, which outranks the sources
    val lolli = Seq((2L, 1L), (1L, 0L), (3L, 0L)).toDF("src", "dst")
    val rl = PageRank.run(lolli, iterations = 10).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rl(0L) > rl(1L) && rl(1L) > rl(2L) && rl(2L) === rl(3L))
  }
}
