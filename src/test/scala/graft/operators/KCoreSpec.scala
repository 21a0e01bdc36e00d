package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** k-core peeling: closed-form fixtures (the cascade property is the whole
  * point — a raw degree threshold must NOT reproduce the answer).
  */
class KCoreSpec extends SparkSpec {

  import spark.implicits._

  private def core(edges: Seq[(Long, Long)], k: Int): Set[Long] =
    KCore.kcore(edges.toDF("src", "dst"), k)
      .collect().map(_.getLong(0)).toSet

  test("5-clique with a hanging path: 2-core peels the path in cascade") {
    // clique 0-4, path 0-10-11-12: every path node has degree <= 2 only
    // AFTER its outer neighbor leaves — three genuine peeling rounds
    val clique = for (a <- 0L until 5L; b <- (a + 1) until 5L) yield (a, b)
    val path = Seq((0L, 10L), (10L, 11L), (11L, 12L))
    assert(core(clique ++ path, 2) === Set(0L, 1L, 2L, 3L, 4L))
    // node 10 starts at degree 2 — a degree threshold alone would KEEP it
    assert(core(clique ++ path, 4) === Set(0L, 1L, 2L, 3L, 4L))
    assert(core(clique ++ path, 5) === Set.empty[Long])
  }

  test("k=1 keeps every non-isolated node; duplicates/orientation ignored") {
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 2L), (3L, 4L))
    assert(core(edges, 1) === Set(1L, 2L, 3L, 4L))
  }

  test("grouped clique+tendril fixture matches its closed form") {
    // the x_kcore fixture shape: per complete group of 8 ids, offsets
    // 0-3 form a 4-clique, offsets 4-7 hang off offset 0 as a path;
    // 2-core = exactly the clique members
    val ids = (0L until 35L) // last group incomplete (32..34) -> excluded
    val groups = ids.map(_ / 8).distinct.filter(g => 8 * g + 7 <= 34)
    val edges = groups.flatMap { g =>
      val b = 8 * g
      val clique = for (a <- 0 until 4; c <- (a + 1) until 4)
        yield (b + a, b + c)
      clique ++ Seq((b, b + 4), (b + 4, b + 5), (b + 5, b + 6), (b + 6, b + 7))
    }
    val want = groups.flatMap(g => (0 until 4).map(8 * g + _)).toSet
    assert(core(edges, 2) === want)
  }

  test("random graphs: matches a reference peeler; cores nest downward in k") {
    val rnd = new scala.util.Random(31)
    def referenceCore(edges: Seq[(Long, Long)], k: Int): Set[Long] = {
      // plain-Scala synchronous peeling over an adjacency map
      var adj = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
        .filter { case (a, b) => a != b }.distinct
        .groupBy(_._1).map { case (n, es) => (n, es.map(_._2).toSet) }
      var changed = true
      while (changed) {
        val dead = adj.collect { case (n, ns) if ns.size < k => n }.toSet
        changed = dead.nonEmpty
        if (changed)
          adj = (adj -- dead).map { case (n, ns) => (n, ns -- dead) }
      }
      adj.keySet.map(_.toLong)
    }
    for (trial <- 0 until 3) {
      val n = 40 + trial * 20
      val edges = Seq.fill(n * 3)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      val cores = (1 to 4).map(k => k -> core(edges, k)).toMap
      for (k <- 1 to 4)
        assert(cores(k) === referenceCore(edges, k), s"trial $trial k=$k")
      // k-cores nest: core(k) is a subgraph of core(k-1)
      for (k <- 2 to 4)
        assert(cores(k).subsetOf(cores(k - 1)), s"trial $trial nesting at k=$k")
    }
  }

  test("non-convergence within maxIter throws instead of truncating") {
    // a 60-node path needs ~30 peeling rounds at k=2 (both ends peel
    // inward); maxIter=3 must refuse rather than return a superset
    val path = (0L until 59L).map(i => (i, i + 1))
    intercept[IllegalStateException] {
      KCore.kcore(path.toDF("src", "dst"), 2, maxIter = 3).collect()
    }
  }
}
