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
