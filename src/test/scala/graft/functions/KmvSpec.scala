package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** KMV/theta sketch contracts: exactness below capacity, estimator
  * accuracy, ORDER-INSENSITIVE bit-identity of any partition of the build
  * (k-smallest-of-union is canonical — stronger than MG's, same class as
  * CMS/HLL), two-sketch theta-cut set algebra, and wire-format hygiene.
  */
class KmvSpec extends SparkSpec {

  private def est(bytes: Array[Byte]): Double =
    KmvSketch.statsBytes(bytes)(0)

  test("below capacity the sketch IS the exact distinct count") {
    val st = KmvSketch.empty(1024)
    (1L to 500L).foreach(KmvSketch.add(st, _))
    (1L to 500L).foreach(KmvSketch.add(st, _)) // duplicates don't count
    assert(est(KmvSketch.toBytes(st)) === 500.0)
  }

  test("estimator lands within 5 RSE on 200k distinct keys") {
    val st = KmvSketch.empty(1024)
    (1L to 200000L).foreach(KmvSketch.add(st, _))
    val e = est(KmvSketch.toBytes(st))
    val rse = 1.0 / math.sqrt(1022.0)
    assert(math.abs(e - 200000.0) / 200000.0 < 5 * rse,
      s"estimate $e too far from 200000")
  }

  test("any partition of the build merges to BIT-IDENTICAL bytes") {
    def build(keys: Seq[Long]): KmvSketch.State = {
      val st = KmvSketch.empty(64)
      keys.foreach(KmvSketch.add(st, _))
      st
    }
    val keys = (1L to 10000L).map(i => i * 7919L)
    val whole = KmvSketch.toBytes(build(keys))
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 5) {
      val shuffled = rnd.shuffle(keys)
      val parts = shuffled.grouped(1234).map(build).toSeq
      val merged = KmvSketch.empty(64)
      parts.foreach(p =>
        KmvSketch.mergeInto(merged, KmvSketch.fromBytes(KmvSketch.toBytes(p))))
      assert(KmvSketch.toBytes(merged).toSeq === whole.toSeq,
        "merge of shards must equal the single build byte-for-byte")
    }
  }

  test("theta-cut overlap estimates intersection/union/jaccard") {
    // A = [1, 60k], B = [40k+1, 100k] -> inter 20k, union 100k, J = 0.2
    val a = KmvSketch.empty(1024)
    (1L to 60000L).foreach(KmvSketch.add(a, _))
    val b = KmvSketch.empty(1024)
    (40001L to 100000L).foreach(KmvSketch.add(b, _))
    val r = KmvSketch.overlapBytes(KmvSketch.toBytes(a), KmvSketch.toBytes(b))
    assert(math.abs(r(0) - 60000) / 60000.0 < 0.16, s"est_a ${r(0)}")
    assert(math.abs(r(1) - 60000) / 60000.0 < 0.16, s"est_b ${r(1)}")
    assert(math.abs(r(2) - 20000) / 20000.0 < 0.30, s"est_inter ${r(2)}")
    assert(math.abs(r(3) - 100000) / 100000.0 < 0.16, s"est_union ${r(3)}")
    assert(math.abs(r(4) - 0.2) < 0.06, s"jaccard ${r(4)}")
    // disjoint sketches: zero intersection, zero jaccard, exactly
    val c = KmvSketch.empty(1024)
    (2000000L to 2060000L).foreach(KmvSketch.add(c, _))
    val d = KmvSketch.overlapBytes(KmvSketch.toBytes(a), KmvSketch.toBytes(c))
    assert(d(2) === 0.0 && d(4) === 0.0)
  }

  test("SQL surface: grouped build + stored merge + overlap") {
    GraftFunctions.register(spark)
    import GraftFunctions._
    val df = spark.range(30000).select(
      (col("id") % 3).as("shard"), col("id"))
    // per-shard sketches stored, merged back: same estimate as one build
    val merged = df.groupBy("shard")
      .agg(graft_kmv(col("id"), 512).as("sk"))
      .agg(graft_kmv_merge(col("sk")).as("sk"))
      .select(graft_kmv_stats(col("sk")).as("st"))
      .first().getAs[scala.collection.Seq[Double]](0)
    val direct = df.agg(graft_kmv(col("id"), 512).as("sk"))
      .select(graft_kmv_stats(col("sk")).as("st"))
      .first().getAs[scala.collection.Seq[Double]](0)
    assert(merged === direct, "merge-of-shards == direct build")
    assert(math.abs(merged(0) - 30000.0) / 30000.0 < 0.16)
    // overlap of two column-built sketches
    val two = spark.range(100000).agg(
      graft_kmv(when(col("id") < 60000, col("id")), 1024).as("a"),
      graft_kmv(when(col("id") >= 40000, col("id")), 1024).as("b"))
      .select(graft_kmv_overlap(col("a"), col("b")).as("o"))
      .first().getAs[scala.collection.Seq[Double]](0)
    assert(math.abs(two(2) - 20000) / 20000.0 < 0.30, s"est_inter ${two(2)}")
  }

  test("empty/unset sketches: stats and overlap return zeros, never throw") {
    // regression: graft_kmv_merge over an empty or all-NULL group evals an
    // UNSET buffer (k=0, size=0); `size < k` is false for 0 < 0, so the
    // estimator used to fall through to TreeSet.last() on an empty set
    val unsetBytes = KmvSketch.toBytes(KmvSketch.empty(0))
    assert(KmvSketch.statsBytes(unsetBytes).toSeq === Seq(0.0, 0.0, 0.0))
    val emptyK = KmvSketch.toBytes(KmvSketch.empty(64))
    assert(KmvSketch.statsBytes(emptyK)(0) === 0.0)
    val a = KmvSketch.empty(64)
    (1L to 1000L).foreach(KmvSketch.add(a, _))
    val r = KmvSketch.overlapBytes(unsetBytes, KmvSketch.toBytes(a))
    assert(r(0) === 0.0 && r(2) === 0.0 && r(4) === 0.0)
    // SQL surface: merge over an all-NULL column must yield a sketch whose
    // stats read 0, not an opaque executor exception
    GraftFunctions.register(spark)
    import GraftFunctions._
    val st = spark.range(10)
      .agg(graft_kmv_merge(lit(null).cast("binary")).as("sk"))
      .select(graft_kmv_stats(col("sk")).as("st"))
      .first().getAs[scala.collection.Seq[Double]](0)
    assert(st(0) === 0.0 && st(1) === 0.0)
  }

  test("k sweep: RSE tracks 1/sqrt(k-2) at k=128/1024/8192; jaccard error shrinks") {
    // the MG K-sweep discipline applied to KMV: for each capacity, run
    // independent trials (disjoint key universes -> independent hash
    // samples), and pin the EMPIRICAL rmse of the distinct estimate to the
    // theoretical ~1/sqrt(k-2) within wide chi-square-safe bounds.
    val n = 200000L
    val trials = 8
    val primes = Seq(7919L, 104729L, 1299709L, 15485863L,
      179424673L, 2038074743L, 32452843L, 49979687L)
    def rmse(k: Int): Double = {
      val errs = primes.take(trials).map { p =>
        val st = KmvSketch.empty(k)
        (1L to n).foreach(i => KmvSketch.add(st, i * p))
        (est(KmvSketch.toBytes(st)) - n) / n.toDouble
      }
      math.sqrt(errs.map(e => e * e).sum / trials)
    }
    val table = Seq(128, 1024, 8192).map { k =>
      val theory = 1.0 / math.sqrt(k - 2.0)
      val emp = rmse(k)
      info(f"k=$k%5d  theoretical RSE ${theory * 100}%5.2f%%  empirical ${emp * 100}%5.2f%%  ratio ${emp / theory}%4.2f")
      assert(emp / theory > 0.35 && emp / theory < 2.0,
        s"k=$k empirical rmse $emp vs theory $theory outside [0.35, 2.0]x")
      (k, emp)
    }
    assert(table.head._2 > table.last._2,
      "a 64x capacity increase must shrink the empirical error")
    // jaccard-vs-k on the overlap fixture (A=[1,60k], B=[40k+1,100k], J=0.2):
    // the theta-cut intersection sample grows with k, so the error shrinks
    def jerr(k: Int): Double = {
      val a = KmvSketch.empty(k)
      (1L to 60000L).foreach(KmvSketch.add(a, _))
      val b = KmvSketch.empty(k)
      (40001L to 100000L).foreach(KmvSketch.add(b, _))
      math.abs(KmvSketch.overlapBytes(
        KmvSketch.toBytes(a), KmvSketch.toBytes(b))(4) - 0.2)
    }
    val (j128, j8192) = (jerr(128), jerr(8192))
    info(f"jaccard |err| at k=128: $j128%.4f, at k=8192: $j8192%.4f")
    assert(j128 < 0.25, s"k=128 jaccard error $j128")
    assert(j8192 < 0.03, s"k=8192 jaccard error $j8192")
  }

  test("mixed-k merge refuses; wire format validates") {
    val a = KmvSketch.empty(64)
    val b = KmvSketch.empty(128)
    KmvSketch.add(a, 1L)
    KmvSketch.add(b, 2L)
    intercept[IllegalArgumentException] { KmvSketch.mergeInto(a, b) }
    intercept[IllegalArgumentException] { KmvSketch.fromBytes(Array[Byte](1, 2, 3)) }
    val corrupt = KmvSketch.toBytes(a).clone()
    corrupt(0) = 'X'
    intercept[IllegalArgumentException] { KmvSketch.fromBytes(corrupt) }
  }
}
