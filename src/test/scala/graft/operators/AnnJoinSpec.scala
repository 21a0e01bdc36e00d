package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AnnJoinSpec extends SparkSpec {

  private def ring(n: Int, dim: Int): Seq[(Long, Seq[Double])] =
    (0 until n).map { i =>
      // well-separated deterministic directions: one-hot-ish with a tail
      val v = Array.tabulate(dim)(d =>
        if (d == i % dim) 4.0 else 0.1 * ((i * 31 + d * 7) % 5))
      (i.toLong, v.toSeq)
    }

  test("annJoin: identical twins rank top-1 at sim 1.0; k bound holds") {
    import spark.implicits._
    val right = ring(40, 8).toDF("id", "v")
    val left = right.select((col("id") + 1000L).as("id"), col("v"))
    val topk = Similarity.annJoin(left, right, "id", "v", k = 2,
      numPlanes = 8, numTables = 8)
    val rows = topk.select("qid", "vid", "sim")
      .as[(Long, Long, Double)].collect()
    val byQ = rows.groupBy(_._1)
    assert(byQ.size === 40, s"${byQ.size} left rows returned")
    assert(byQ.values.forall(_.length <= 2), "per-left k bound broken")
    for ((q, rs) <- byQ) {
      val best = rs.maxBy(r => (r._3, -r._2))
      assert(best._2 === q - 1000L && best._3 === 1.0,
        s"twin of $q not top-1: $rs")
    }
  }

  test("r16 scored-bucket-join shape is output-identical to the old ids-only + join-back shape") {
    // the r16 restructure moved scoring inside the bucket join and pair
    // dedup after it; this pins set-equality against the retained
    // old-shape helpers on a corpus with twins (sim 1.0), near-pairs and
    // occupancy-cap pressure, for both knnJoin and embeddingNearDup
    import spark.implicits._
    val base = ring(60, 8)
    val twins = base.take(20).map { case (i, v) => (i + 1000L, v) }
    val vecsDf = (base ++ twins).toDF("id", "v")
    val planes = 6; val tables = 8; val cap = 8 // cap low enough to fire
    val proj = vecsDf.select(col("id").cast("long").as("id"),
      col("v").cast("array<double>").as("v"))
      .persist()
    try {
      // knn: new production operator vs old-shape reference tail
      val newKnn = Similarity.knnJoin(vecsDf, "id", "v", k = 3,
        numPlanes = planes, numTables = tables, maxOccupancy = cap)
      val (oldCand, release) = Similarity.lshCandidatePairsManaged(
        proj, planes, tables, cap)
      val oldKnn = Similarity.knnVerifyTopK(oldCand, proj, 3)
      assert(newKnn.except(oldKnn).count() === 0)
      assert(oldKnn.except(newKnn).count() === 0)
      release()
      // near-dup: new production operator vs old-shape verify
      val newDup = Dedup.embeddingNearDup(vecsDf, "id", "v",
        threshold = 0.99, numPlanes = planes, numTables = tables,
        maxOccupancy = cap, contentSeededSplit = true)
      val (oldCand2, release2) = Similarity.lshCandidatePairsManaged(
        proj, planes, tables, cap, contentSeededSplit = true)
      val oldDup = Dedup.embeddingVerify(oldCand2, proj, 0.99)
      assert(newDup.except(oldDup).count() === 0)
      assert(oldDup.except(newDup).count() === 0)
      release2()
      // the collision stream's distinct pairs ARE the old candidate set
      val collDistinct = Similarity.lshVectorCollisionsForDiag(
        proj, planes, tables, cap).select("id1", "id2").distinct()
      val cands = Similarity.lshCandidatePairsForDiag(
        proj, planes, tables, cap)
      assert(collDistinct.except(cands).count() === 0)
      assert(cands.except(collDistinct).count() === 0)
    } finally proj.unpersist()
  }

  test("collisionJoinPartitions: session floor, linear growth, cap") {
    // gate SF: the banded stream fits the session layout -> floor
    assert(Similarity.collisionJoinPartitions(32, 2020, 8, 64) === 32)
    // the measured 1000x knn regime (2M vectors, 15 tables, 64-dim):
    // 2 x 2e6 x 15 x 560 B ~= 33.6 GB -> ~263 partitions at 128 MB
    val at1000x = Similarity.collisionJoinPartitions(32, 2000000L, 15, 64)
    assert(at1000x > 200 && at1000x < 300, s"got $at1000x")
    // scales linearly with the corpus, capped at 20000
    assert(Similarity.collisionJoinPartitions(32, 2000000000L, 15, 64) === 20000)
    // degenerate inputs stay at the floor
    assert(Similarity.collisionJoinPartitions(32, 0L, 15, 64) === 32)
    assert(Similarity.collisionJoinPartitions(200, 2020, 8, 0) === 200)
  }

  test("adaptive collision parallelism engaged: outputs identical under a 1-partition session") {
    // force the derived count past the session's so the explicit
    // same-key repartition engages, and pin output equality vs the
    // non-adaptive path (partitioning must never change results)
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    try {
      import spark.implicits._
      val vecsDf = ring(50, 8).toDF("id", "v")
      val proj = vecsDf.select(col("id").cast("long").as("id"),
        col("v").cast("array<double>").as("v")).persist()
      try {
        // 1 KiB target forces the derived count far past the 1-partition
        // session, so the explicit repartition is actually in the plan
        val adaptive = Similarity.lshVectorCollisionsForDiag(
          proj, 6, 8, 8, targetPartitionBytes = 1024L)
        assert(adaptive.rdd.getNumPartitions > 1,
          "adaptive repartition did not engage")
        val adaptiveSet = adaptive.select("id1", "id2").distinct()
        val fixed = Similarity.lshVectorCollisionsForDiag(
          proj, 6, 8, 8, adaptiveParts = false)
          .select("id1", "id2").distinct()
        assert(adaptiveSet.except(fixed).count() === 0)
        assert(fixed.except(adaptiveSet).count() === 0)
      } finally proj.unpersist()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("annJoin: left and right are genuinely asymmetric (no self pairs, right-only ids)") {
    import spark.implicits._
    val right = ring(30, 8).toDF("id", "v")
    val left = ring(10, 8).map { case (i, v) => (i + 500L, v) }.toDF("id", "v")
    val topk = Similarity.annJoin(left, right, "id", "v", k = 3,
      numPlanes = 8, numTables = 8)
    val (qids, vids) = (topk.select("qid").as[Long].collect().toSet,
      topk.select("vid").as[Long].collect().toSet)
    assert(qids.forall(_ >= 500L), "right-side id leaked into qid")
    assert(vids.forall(_ < 500L), "left-side id leaked into vid")
  }
}
