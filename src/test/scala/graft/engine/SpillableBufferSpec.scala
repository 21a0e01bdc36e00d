package graft.engine

import graft.SparkSpec

class SpillableBufferSpec extends SparkSpec {

  test("stays on heap under the bound; no spill file") {
    val b = new SpillableBuffer[Int](10)
    (1 to 10).foreach(b.append)
    b.seal()
    assert(!b.spilled && b.size == 10)
    assert(b.iterator.toSeq == (1 to 10))
    assert(b.iterator.toSeq == (1 to 10)) // re-iterable
    b.close()
  }

  test("spills past the bound, preserves order, re-iterates from disk") {
    val b = new SpillableBuffer[Long](100)
    (1L to 5000L).foreach(b.append)
    b.seal()
    assert(b.spilled && b.size == 5000)
    assert(b.iterator.toSeq == (1L to 5000L))
    assert(b.iterator.drop(4998).toSeq == Seq(4999L, 5000L)) // second pass
    b.close()
  }

  test("hot-key cogroup join: 1M-row right group joins under a 1000-element heap bound") {
    import spark.implicits._
    // ONE key holds a million right rows; the per-key buffer is capped at
    // 1000 elements, so ~999k values live on executor-local disk while the
    // cross product streams. 2 left rows x 1M right rows = 2M output.
    val left = new PairDataflow(Seq((1L, "a"), (1L, "b"), (2L, "only")).toDS())
    val right = new PairDataflow(
      spark.range(1000000L).map(i => (1L, i.longValue())).union(Seq((2L, -1L)).toDS()))
    val out = left.join(right, maxBufferedPerKey = 1000).ds.cache()
    try {
      assert(out.count() == 2000001L)
      // spot-check content: every right value appears with both left values
      val k1 = out.filter(_._1 == 1L).map(_._2).groupByKey(_._2).count().collect()
      assert(k1.length == 1000000 && k1.forall(_._2 == 2L))
      assert(out.filter(_._1 == 2L).collect().toSet == Set((2L, ("only", -1L))))
    } finally out.unpersist()
  }
}
