package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Generator-based properties for the round-2 kernels: the bounded-heap
  * top-k aggregate against a naive sort-take reference, and the
  * nearest-centroid kernel against a scala argmax. Gen with fixed seeds
  * (scalatestplus bridge isn't in the offline dep cache).
  */
class KernelPropertiesSpec extends SparkSpec {

  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int = 5): Seq[A] =
    (0 until n).flatMap(i =>
      gen.apply(Gen.Parameters.default.withSize(60), Seed(1042L + i)))

  // (qid, vid, sim) with deliberate collisions in qid/sim to stress ties
  private val scoredRows: Gen[List[(Long, Long, Double)]] =
    Gen.listOf(Gen.zip(
      Gen.chooseNum(0L, 3L),
      Gen.chooseNum(0L, 40L),
      Gen.chooseNum(0, 10).map(_ / 10.0)))

  test("graft_topk == sort-take reference for every (qid, k)") {
    GraftFunctions.register(spark)
    for (rowsRaw <- samples(scoredRows); k <- Seq(1, 3, 7)) {
      // the aggregate sees each (vid) once per qid at a given sim; dedupe
      // (qid, vid) keeping max sim to make the reference well-defined
      val rows = rowsRaw.groupBy(r => (r._1, r._2))
        .map { case ((q, v), g) => (q, v, g.map(_._3).max) }.toList
      val got = rows.toDF("qid", "vid", "sim").repartition(5)
        .groupBy("qid")
        .agg(GraftFunctions.graft_topk(col("vid"), col("sim"), k).as("tk"))
        .select(col("qid"), explode(col("tk")).as("e"))
        .select(col("qid"), col("e.vid"), col("e.sim"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toSeq).toMap
      val expected = rows.groupBy(_._1).view.mapValues(g =>
        g.map(t => (t._2, t._3))
          .sortBy { case (vid, sim) => (-sim, vid) }.take(k).toSeq).toMap
      assert(got.keySet == expected.keySet)
      for (q <- expected.keySet)
        assert(got(q).toSeq == expected(q).toSeq,
          s"qid=$q k=$k got=${got(q)} expected=${expected(q)}")
    }
  }

  test("graft_nearest_centroid == scala argmax over random vectors") {
    GraftFunctions.register(spark)
    val vecs: Gen[List[List[Double]]] =
      Gen.nonEmptyListOf(Gen.listOfN(6, Gen.chooseNum(-50, 50).map(_ / 10.0)))
    for (vs <- samples(vecs, 4)) {
      val cents = vs.take(4).padTo(2, List(1.0, 0.0, 0.0, 0.0, 0.0, 0.0))
      val centLit = typedlit(cents.map(_.toSeq))
      val got = vs.map(Tuple1(_)).toDF("v")
        .select(GraftFunctions.graft_nearest_centroid(col("v"), centLit))
        .collect().map(_.getInt(0)).toSeq
      val expected = vs.map { v =>
        val sims = cents.map(c => VectorOps.cosineArr(v.toArray, c.toArray))
        sims.zipWithIndex.reduceLeft((a, b) => if (b._1 > a._1) b else a)._2
      }
      assert(got == expected)
    }
  }

  test("graft_project: deterministic, right width, roughly norm-preserving") {
    GraftFunctions.register(spark)
    val vecs = (0 until 100).map(i =>
      Tuple1(Seq.tabulate(64) { d =>
        math.floorMod(java.lang.Long.rotateLeft(i * 2654435761L + d * 40503L, d % 29), 2000L) / 1000.0 - 1.0
      }))
    val df = vecs.toDF("v")
    val out = df.select(GraftFunctions.graft_project(col("v"), 16).as("p"),
      graft.operators.Similarity.cosine(col("v"), col("v")).as("self"))
      .collect()
    assert(out.forall(_.getSeq[Double](0).length == 16))
    val again = df.select(GraftFunctions.graft_project(col("v"), 16).as("p"))
      .collect().map(_.getSeq[Double](0))
    assert(out.map(_.getSeq[Double](0).toSeq).toSeq == again.map(_.toSeq).toSeq)
    // JL norm preservation in expectation: projected norm within 2x of original
    val norms = vecs.zip(again).map { case (Tuple1(v), p) =>
      (math.sqrt(v.map(x => x * x).sum), math.sqrt(p.map(x => x * x).sum))
    }
    assert(norms.forall { case (n0, n1) => n1 > n0 * 0.5 && n1 < n0 * 2.0 },
      norms.take(5).toString)
  }

  test("hyperplaneSigs: deterministic, table count respected, tables differ on big corpora") {
    GraftFunctions.register(spark)
    val vecs = (0 until 200).map(i =>
      Tuple1(Seq.tabulate(8)(d => math.sin(i * 13 + d * 7).toDouble)))
    val df = vecs.toDF("v")
    val sigs = df.select(GraftFunctions.graft_hyperplanes(col("v"), 12, 6).as("s"))
      .collect().map(_.getSeq[Long](0))
    assert(sigs.forall(_.length == 6))
    assert(sigs.forall(_.forall(s => s >= 0 && s < (1L << 12))))
    val again = df.select(GraftFunctions.graft_hyperplanes(col("v"), 12, 6).as("s"))
      .collect().map(_.getSeq[Long](0))
    assert(sigs.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
    // across 200 vectors the 6 tables cannot all agree unless planes collide
    assert((1 until 6).exists(t => sigs.exists(r => r(t) != r(0))))
  }

  test("cached plane weights reproduce the inline XXH64 derivation bit-for-bit") {
    // VectorOps.planeWeights materializes the +-1 weight matrix once per
    // (planes, tables, dim) config; every signature, on every executor, in
    // every round must still equal the seed-pure inline formula — an
    // independent re-derivation here, including null-element vectors
    // (skipped dims) and a dim the cache has not seen before.
    import org.apache.spark.sql.catalyst.expressions.XXH64
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    def inlineSig(v: Array[java.lang.Double], planes: Int, t: Long): Long = {
      var sig = 0L
      var p = 0
      while (p < planes) {
        var proj = 0.0
        var d = 0
        while (d < v.length) {
          if (v(d) != null) {
            val w = if ((XXH64.hashLong(p.toLong * 65536 + d, t) & 8L) == 8L) 1.0
              else -1.0
            proj += v(d) * w
          }
          d += 1
        }
        if (proj > 0) sig |= (1L << p)
        p += 1
      }
      sig
    }
    for ((planes, tables, dim) <- Seq((12, 6, 8), (18, 25, 64), (9, 3, 17));
         q <- 0 until 20) {
      val v: Array[java.lang.Double] = Array.tabulate(dim) { d =>
        if (q == 7 && d % 5 == 3) null // null elements skip their dim
        else java.lang.Double.valueOf(math.sin(q * 31 + d * 11 + planes))
      }
      val got = VectorOps.hyperplaneSigs(
        new GenericArrayData(v.asInstanceOf[Array[Any]]), planes, tables)
      for (t <- 0 until tables)
        assert(got.getLong(t) == inlineSig(v, planes, t.toLong),
          s"($planes,$tables,$dim) q=$q t=$t")
    }
  }

  test("nearest2 pruned path == brute (sim desc, index asc) over random codebooks") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    def arr(xs: Array[Double]) = new GenericArrayData(xs)
    def mat(rows: Array[Array[Double]]) =
      new GenericArrayData(rows.map(r => new GenericArrayData(r)): Array[Any])
    // generated configs all trip CoarseMinCentroids (>=192), with
    // clustered structure (group center + noise) so the coarse index has
    // real pruning work, plus occasional duplicated/zero rows
    val cfg = Gen.zip(Gen.chooseNum(200, 420), Gen.chooseNum(4, 24),
      Gen.chooseNum(1, 1000000))
    for ((m, dim, seed) <- samples(cfg, n = 4)) {
      val rnd = new scala.util.Random(seed)
      val centers = Array.fill(12, dim)(rnd.nextGaussian())
      val rows = Array.tabulate(m) { i =>
        if (i % 131 == 97) new Array[Double](dim) // a zero-norm row
        else if (i % 67 == 13) // exact duplicate of an earlier row
          Array.tabulate(dim)(d => centers(0)(d) + 0.01 * d)
        else {
          val c = centers(i % 12)
          Array.tabulate(dim)(d => c(d) + 0.15 * rnd.nextGaussian())
        }
      }
      val cents = mat(rows)
      for (_ <- 0 until 25) {
        val q = {
          val c = centers(rnd.nextInt(12))
          Array.tabulate(dim)(d => c(d) + 0.2 * rnd.nextGaussian())
        }
        val got = VectorOps.nearest2Centroids(arr(q), cents).toIntArray().toSeq
        val want = rows.indices
          .sortBy(i => (-VectorOps.cosineArr(q, rows(i)), i)).take(2)
        assert(got == want, s"m=$m dim=$dim seed=$seed: got $got want $want")
      }
    }
  }
}
