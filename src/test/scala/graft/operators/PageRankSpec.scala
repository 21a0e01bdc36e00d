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

  test("redistributeDangling conserves total mass on a dangling-heavy graph") {
    import spark.implicits._
    // star graph: the hub is dangling and absorbs most of the mass — the
    // harshest case for the drop-mass convention (default mode leaks the
    // hub's entire rank every sweep). Under redistribution sum(rank) must
    // stay exactly 1 (up to float error) at every iteration count.
    val edges = (1 to 9).map(i => (i.toLong, 0L)).toDF("src", "dst")
    for (iters <- Seq(1, 3, 10)) {
      val total = PageRank.run(edges, iterations = iters,
        redistributeDangling = true)
        .agg(sum("rank")).first().getDouble(0)
      assert(math.abs(total - 1.0) < 1e-9, s"iters=$iters total=$total")
    }
    // and the default mode really does decay (the documented convention)
    val dropped = PageRank.run(edges, iterations = 10)
      .agg(sum("rank")).first().getDouble(0)
    assert(dropped < 0.999, s"drop-mass mode should leak: $dropped")
  }

  test("tolerance-based early stop matches the full run") {
    import spark.implicits._
    // two-cycle converges in one sweep (uniform is the fixed point): a
    // tol run must stop early and still return the exact fixed point
    val two = Seq((0L, 1L), (1L, 0L)).toDF("src", "dst")
    val r = PageRank.run(two, iterations = 50, tol = 1e-12).collect()
      .map(x => x.getDouble(1))
    assert(r.forall(v => math.abs(v - 0.5) < 1e-9))
  }

  test("reliable checkpoint cadence produces the same ranks") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("pr-ckpt").toString
    val sc = spark.sparkContext
    sc.setCheckpointDir(dir)
    try {
      val edges = Seq((2L, 1L), (1L, 0L), (3L, 0L), (0L, 2L))
        .toDF("src", "dst")
      val base = PageRank.run(edges, iterations = 7)
        .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
      // interval 2 over 7 iterations: checkpoints fire mid-loop AND the
      // final sweep takes the it==iterations branch
      val ck = PageRank.run(edges, iterations = 7, checkpointInterval = 2)
        .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
      assert(ck.keySet == base.keySet)
      for ((k, v) <- base)
        assert(math.abs(ck(k) - v) < 1e-12, s"node $k: ${ck(k)} vs $v")
      // the reliable path actually wrote checkpoint data
      val wrote = new java.io.File(dir).listFiles()
      assert(wrote != null && wrote.nonEmpty, "no reliable checkpoint written")
    } finally {
      // un-set so other suites sharing the session fall back to local mode
      sc.setCheckpointDir(null)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }
}
