package graft.operators

import graft.SparkSpec
import graft.functions.VectorOps
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._

/** SemDeDup-style semantic dedup: the top-2 assignment kernel and the
  * cluster-bucketed pair operator (Dedup.semanticNearDup).
  */
class SemanticDedupSpec extends SparkSpec {

  private def arr(xs: Double*) = new GenericArrayData(xs.toArray)
  private def mat(rows: Array[Double]*) =
    new GenericArrayData(rows.map(r => new GenericArrayData(r)).toArray)

  test("nearest2Centroids returns best-first, ties to lowest index") {
    val cents = mat(Array(1.0, 0.0), Array(0.0, 1.0), Array(1.0, 1.0))
    // cos to (1,0.2): c0 = .981, c1 = .196, c2 = .832
    val got = VectorOps.nearest2Centroids(arr(1.0, 0.2), cents)
    assert(got.toIntArray().toSeq === Seq(0, 2))
    // exact tie between c0 and a duplicate of c0 at index 1 -> lowest first
    val tied = mat(Array(1.0, 0.0), Array(2.0, 0.0), Array(0.0, 1.0))
    assert(VectorOps.nearest2Centroids(arr(3.0, 0.0), tied)
      .toIntArray().toSeq === Seq(0, 1))
  }

  test("nearest2Centroids head equals nearestCentroid; 1-centroid codebook repeats") {
    val cents = mat(Array(1.0, 0.0, 0.0), Array(0.0, 1.0, 0.0), Array(0.0, 0.0, 1.0))
    for (v <- Seq(arr(0.3, 0.9, 0.1), arr(0.9, 0.1, 0.2), arr(0.1, 0.2, 0.9))) {
      assert(VectorOps.nearest2Centroids(v, cents).toIntArray()(0) ===
        VectorOps.nearestCentroid(v, cents))
    }
    val one = mat(Array(1.0, 0.0))
    assert(VectorOps.nearest2Centroids(arr(0.5, 0.5), one)
      .toIntArray().toSeq === Seq(0, 0))
  }

  test("nearest2Centroids fast path matches brute-force cosine ranking") {
    // 50 deterministic pseudo-random centroids, dim 8 (clean input -> the
    // memoized primitive fast path); winners must equal an independent
    // brute-force argmax over VectorOps.cosineArr.
    def prng(seed: Int): Double = {
      val x = seed * 2654435761L
      ((x % 1000).toDouble / 500.0) - 1.0
    }
    val cents = Array.tabulate(50, 8)((i, j) => prng(i * 8 + j + 1))
    val centsAd = mat(cents: _*)
    for (q <- 0 until 20) {
      val v = Array.tabulate(8)(j => prng(1000 + q * 8 + j))
      val got = VectorOps.nearest2Centroids(arr(v.toIndexedSeq: _*), centsAd)
        .toIntArray().toSeq
      val ranked = cents.indices
        .sortBy(i => (-VectorOps.cosineArr(v, cents(i)), i)).take(2)
      assert(got === ranked, s"query $q: got $got want $ranked")
    }
    // a matrix with a null row takes the general path and skips that row
    val withNull = new GenericArrayData(Array[Any](
      null, new GenericArrayData(Array(1.0, 0.0)), new GenericArrayData(Array(0.0, 1.0))))
    assert(VectorOps.nearest2Centroids(arr(1.0, 0.1), withNull)
      .toIntArray().toSeq === Seq(1, 2))
  }

  test("pruned coarse-index path (>=192 centroids) is exactly brute force") {
    // 400 deterministic centroids at dim 16 trip the CoarseMinCentroids
    // threshold, so nearest2Centroids runs the angular-pruned search;
    // every query must match an independent (sim desc, index asc) top-2 —
    // including exact-duplicate centroids (ties) and zero-norm rows.
    def prng(seed: Int): Double = {
      val x = seed * 2654435761L
      ((x % 1000).toDouble / 500.0) - 1.0
    }
    val cents = Array.tabulate(400, 16) { (i, j) =>
      if (i == 57) 0.0 // a zero-norm centroid (sim defined as 0)
      else if (i == 201) prng(7 * 16 + j + 1) // exact duplicate of row 7
      else prng(i * 16 + j + 1)
    }
    val centsAd = mat(cents: _*)
    for (q <- 0 until 50) {
      val v = Array.tabulate(16)(j => prng(5000 + q * 16 + j))
      val got = VectorOps.nearest2Centroids(arr(v.toIndexedSeq: _*), centsAd)
        .toIntArray().toSeq
      val ranked = cents.indices
        .sortBy(i => (-VectorOps.cosineArr(v, cents(i)), i)).take(2)
      assert(got === ranked, s"query $q: got $got want $ranked")
    }
    // a query whose top-1 IS a duplicated direction must rank the
    // identical centroids in index order (the prng collides every 125
    // rows, so 7 == 132 == 201 == 257 == 382: the tie group is real and
    // the first two BY INDEX must win)
    val dupDir = cents(7).clone()
    val gotDup = VectorOps.nearest2Centroids(arr(dupDir.toIndexedSeq: _*),
      centsAd).toIntArray().toSeq
    val rankedDup = cents.indices
      .sortBy(i => (-VectorOps.cosineArr(dupDir, cents(i)), i)).take(2)
    assert(gotDup === rankedDup && gotDup === Seq(7, 132),
      s"tie order broken: $gotDup want $rankedDup")
  }

  test("nearest2CentroidsBatch matches the per-row path exactly, any batch fill") {
    // the batched kernel (broadcast-codebook assignment path) must agree
    // with nearest2Centroids on every row — including zero-norm queries,
    // zero-norm centroids, duplicate centroids (ties -> index order), and
    // partial batch fills — since the operator's recall gates and the
    // committed scale rows both assume assignment parity
    def prng(seed: Int): Double = {
      val x = seed * 2654435761L
      ((x % 1000).toDouble / 500.0) - 1.0
    }
    val cents = Array.tabulate(300, 12) { (i, j) =>
      if (i == 31) 0.0
      else if (i == 170) prng(9 * 12 + j + 1) // duplicate of row 9
      else prng(i * 12 + j + 1)
    }
    val centsAd = mat(cents: _*)
    val norms = VectorOps.l2Norms(cents)
    val queries = Array.tabulate(37) { q => // 37: exercises a partial tail batch
      if (q == 11) Array.fill(12)(0.0) // zero-norm query
      else if (q == 23) cents(9).clone() // lands on the duplicated direction
      else Array.tabulate(12)(j => prng(9000 + q * 12 + j))
    }
    for (batchSize <- Seq(1, 4, 16)) {
      val best = new Array[Int](batchSize)
      val second = new Array[Int](batchSize)
      var i = 0
      while (i < queries.length) {
        val m = math.min(batchSize, queries.length - i)
        val block = java.util.Arrays.copyOfRange(queries, i, i + m)
        VectorOps.nearest2CentroidsBatch(block, m, cents, norms, best, second)
        for (b <- 0 until m) {
          val want = VectorOps.nearest2Centroids(
            arr(queries(i + b).toIndexedSeq: _*), centsAd).toIntArray().toSeq
          assert(Seq(best(b), second(b)) === want,
            s"batch=$batchSize row ${i + b}: got ${Seq(best(b), second(b))} want $want")
        }
        i += m
      }
    }
  }

  test("semanticNearDup recovers a boundary-straddling pair via top-2 assignment") {
    import spark.implicits._
    // Two tight clusters around e1 and e2 plus one near-dup pair placed ON
    // the bisector between them: single-cluster assignment can split the
    // pair (each point snaps to a different side), the top-2 runner-up
    // always reaches across.
    val a = Array(1.0, 0.02)  // barely on the e1 side of the bisector
    val b = Array(1.02, 1.0)  // cosine(a,b) ~ 0.72 -- NOT a dup
    val rows =
      (0L to 9L).map(i => (i, Seq(1.0, 0.001 * i))) ++        // cluster 1
      (10L to 19L).map(i => (i, Seq(0.001 * (i - 10), 1.0))) ++ // cluster 2
      Seq((100L, Seq(1.0, 0.999)), (101L, Seq(0.999, 1.0)))   // bisector pair
    val df = rows.toDF("id", "vec")
    val pairs = Dedup.semanticNearDup(df, "id", "vec",
      threshold = 0.999, nlist = 2, iterations = 5)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((100L, 101L)),
      s"boundary pair lost; got $pairs")
    // and the threshold held: no cross-cluster (sub-0.999) pair leaked in
    assert(pairs.forall { case (x, y) => (x < 10 && y < 10) ||
      (x >= 10 && x < 20 && y >= 10 && y < 20) || (x, y) == ((100L, 101L)) },
      s"sub-threshold pair leaked: $pairs")
  }

  test("semanticNearDup maxOccupancy split keeps the pair list a subset and bounded") {
    import spark.implicits._
    // One degenerate direction: every vector near-identical => one cluster
    // holds everything, the split must fire and the result must stay a
    // subset of the unsplit pairs (same threshold).
    val rows = (0L until 64L).map(i => (i, Seq(1.0, 1e-6 * i, 1e-6 * (i % 7))))
    val df = rows.toDF("id", "vec")
    val full = Dedup.semanticNearDup(df, "id", "vec",
      threshold = 0.9999, nlist = 4, iterations = 2, maxOccupancy = 0)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val split = Dedup.semanticNearDup(df, "id", "vec",
      threshold = 0.9999, nlist = 4, iterations = 2, maxOccupancy = 8)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(split.subsetOf(full), "split produced pairs the unsplit pass lacks")
    // occupancy 8 over ~128 assignment rows in one hot cluster => the split
    // really fired (full pair count is ~64*63/2 per shared cluster; the
    // split count must be far below it)
    assert(full.size > split.size, "maxOccupancy split never fired")
  }
}
