package graft.operators

import graft.SparkSpec

class ConnectedComponentsSpec extends SparkSpec {

  import spark.implicits._

  /** Ground truth by sequential union-find. */
  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    (0 until n).map { i =>
      var r = find(i)
      i.toLong -> r.toLong
    }.toMap
  }

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.clusters(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chains, cliques, singleton pairs, self-loops") {
    val chain = (0L until 9L).map(i => (i, i + 1))          // one long component
    val clique = for (i <- 10L to 13L; j <- (i + 1) to 13L) yield (i, j)
    val pair = Seq((20L, 21L))
    val selfLoop = Seq((30L, 30L))                           // dropped entirely
    val got = run(chain ++ clique ++ pair ++ selfLoop)
    assert((0L to 9L).forall(got(_) == 0L))
    assert((10L to 13L).forall(got(_) == 10L))
    assert(got(20L) == 20L && got(21L) == 20L)
    assert(!got.contains(30L)) // a self-loop connects nothing
  }

  test("matches union-find on seeded random graphs") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 200
      val edges = Seq.fill(150)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)).filter(e => e._1 != e._2)
      val truth = unionFind(n, edges)
      val got = run(edges)
      val nodesInPairs = edges.flatMap(e => Seq(e._1, e._2)).toSet
      nodesInPairs.foreach { id =>
        assert(got(id) == truth(id), s"trial $trial node $id: ${got(id)} vs ${truth(id)}")
      }
    }
  }

  test("representatives: unpaired ids are their own cluster; one rep per cluster") {
    val ids = (0L until 20L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val got = ConnectedComponents
      .representatives(ids, "doc_id", pairs, "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(got.length == 20)
    val byId = got.map(g => g._1 -> g).toMap
    assert(byId(1L)._2 == 1L && byId(2L)._2 == 1L && byId(3L)._2 == 1L)
    assert(byId(10L)._2 == 10L && byId(11L)._2 == 10L)
    assert(byId(5L)._2 == 5L && byId(5L)._3) // untouched id reps itself
    // exactly one representative per cluster
    got.groupBy(_._2).foreach { case (c, members) =>
      assert(members.count(_._3) == 1, s"cluster $c has ${members.count(_._3)} reps")
    }
  }

  test("representatives rejects non-integral id columns like clusters does") {
    val ids = Seq("a", "b").toDF("doc_id")
    val pairs = Seq((1L, 2L)).toDF("a", "b")
    val err = intercept[IllegalArgumentException] {
      ConnectedComponents.representatives(ids, "doc_id", pairs, "a", "b")
    }
    assert(err.getMessage.contains("integral"))
  }

  test("empty pair set yields empty labels") {
    assert(run(Seq.empty).isEmpty)
  }

  test("round checkpoints are freed: only the result's blocks survive") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val labels = ConnectedComponents.clusters(
      (0L until 50L).map(i => (i, i + 1)).toDF("a", "b"), "a", "b")
    labels.count()
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    // a 51-node chain needs several star rounds; every intermediate
    // checkpoint must be unpersisted, leaving only the final labels RDD
    assert(leaked.size <= 1, s"${leaked.size} persisted RDDs survive clusters()")
  }
}
