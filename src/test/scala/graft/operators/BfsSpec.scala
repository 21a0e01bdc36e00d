package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BfsSpec extends SparkSpec {

  test("star: every spoke is one hop from the seeded hub") {
    import spark.implicits._
    val edges = (1L to 8L).flatMap(i => Seq((0L, i), (i, 0L)))
      .toDF("src", "dst")
    val seeds = Seq(0L).toDF("id")
    val d = Bfs.multiSourceDistance(edges, seeds).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(d(0L) == 0)
    for (i <- 1L to 8L) assert(d(i) == 1, s"spoke $i: ${d(i)}")
  }

  test("multi-source takes the NEAREST seed; unreachable nodes are absent") {
    import spark.implicits._
    // chain 0-1-2-3-4-5 seeded at 0 and 5, plus an isolated edge 100-101
    val chain = (0L until 5L).flatMap(i => Seq((i, i + 1), (i + 1, i)))
    val edges = (chain ++ Seq((100L, 101L), (101L, 100L))).toDF("src", "dst")
    val seeds = Seq(0L, 5L).toDF("id")
    val d = Bfs.multiSourceDistance(edges, seeds).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(d == Map(0L -> 0, 1L -> 1, 2L -> 2, 3L -> 2, 4L -> 1, 5L -> 0),
      s"got $d")
  }

  test("maxIter truncates the frontier; directed edges are respected") {
    import spark.implicits._
    // directed path 0 -> 1 -> 2 -> 3: with maxIter 2 node 3 is absent,
    // and nothing propagates backwards
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L)).toDF("src", "dst")
    val seeds = Seq(0L).toDF("id")
    val d = Bfs.multiSourceDistance(edges, seeds, maxIter = 2).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(d == Map(0L -> 0, 1L -> 1, 2L -> 2), s"got $d")
    // seed at the sink: nothing else is reachable
    val back = Bfs.multiSourceDistance(edges, Seq(3L).toDF("id")).collect()
    assert(back.length == 1 && back(0).getLong(0) == 3L)
  }

  test("reliable checkpoint path matches local mode and writes checkpoints") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bfs-ckpt").toString
    val sc = spark.sparkContext
    val chain = (0L until 6L).flatMap(i => Seq((i, i + 1), (i + 1, i)))
      .toDF("src", "dst")
    val seeds = Seq(0L).toDF("id")
    val local = Bfs.multiSourceDistance(chain, seeds).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    sc.setCheckpointDir(dir)
    try {
      val rel = Bfs.multiSourceDistance(chain, seeds).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(rel == local, s"reliable path diverged: $rel vs $local")
      val wrote = new java.io.File(dir).listFiles()
      assert(wrote != null && wrote.nonEmpty, "no reliable checkpoint written")
    } finally {
      sc.setCheckpointDir(null)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }
}
