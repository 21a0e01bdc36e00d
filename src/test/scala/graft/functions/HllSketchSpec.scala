package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HllSketchSpec extends SparkSpec {

  private def hash(i: Long): Long =
    // any well-mixed 64-bit function works for kernel-level tests; use the
    // same finalizer family xxhash-style mixers use
    {
      var x = i * -7046029254386353131L
      x ^= x >>> 32
      x *= -4417276706812531889L
      x ^= x >>> 29
      x
    }

  test("kernel: small cardinalities are near-exact (linear counting)") {
    for (n <- Seq(1, 10, 100, 1000)) {
      val reg = HllSketch.emptySketch
      (1 to n).foreach(i => HllSketch.addHash(reg, hash(i.toLong)))
      val est = HllSketch.cardinality(reg)
      assert(math.abs(est - n) <= math.max(1, 0.05 * n),
        s"n=$n est=$est")
    }
  }

  test("kernel: 100k cardinality within 5 rsd; duplicates don't move registers") {
    val reg = HllSketch.emptySketch
    (1 to 100000).foreach(i => HllSketch.addHash(reg, hash(i.toLong)))
    val est = HllSketch.cardinality(reg)
    assert(math.abs(est - 100000) <= 5 * 0.0163 * 100000, s"est=$est")
    val before = reg.clone()
    (1 to 100000).foreach(i => HllSketch.addHash(reg, hash(i.toLong)))
    assert(reg.toSeq === before.toSeq, "re-adding the same hashes changed registers")
  }

  test("kernel: merge is commutative, associative, and equals direct build") {
    val a = HllSketch.emptySketch
    val b = HllSketch.emptySketch
    val direct = HllSketch.emptySketch
    (1 to 5000).foreach { i =>
      val h = hash(i.toLong)
      if (i % 2 == 0) HllSketch.addHash(a, h) else HllSketch.addHash(b, h)
      HllSketch.addHash(direct, h)
    }
    val ab = a.clone(); HllSketch.mergeInto(ab, b)
    val ba = b.clone(); HllSketch.mergeInto(ba, a)
    assert(ab.toSeq === ba.toSeq, "merge not commutative")
    assert(ab.toSeq === direct.toSeq, "split-and-merge != direct build")
  }

  test("SQL surface: grouped sketches round-trip parquet and merge to the direct estimate") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    import graft.functions.GraftFunctions.{graft_hll, graft_hll_card, graft_hll_merge}
    val df = (1 to 4000).map(i => (i % 7, i % 997)).toDF("g", "v")
    val tmp = java.nio.file.Files.createTempDirectory("hll-spec")
    try {
      df.groupBy("g").agg(graft_hll(xxhash64(col("v"))).as("sk"))
        .write.mode("overwrite").parquet(tmp.resolve("sk").toString)
      val merged = spark.read.parquet(tmp.resolve("sk").toString)
        .agg(graft_hll_card(graft_hll_merge(col("sk"))).as("est"))
        .collect()(0).getLong(0)
      val direct = df.agg(graft_hll_card(graft_hll(xxhash64(col("v")))).as("est"))
        .collect()(0).getLong(0)
      assert(merged === direct, s"merged $merged != direct $direct")
      assert(math.abs(merged - 997) <= math.max(3, 5 * 0.0163 * 997), s"est=$merged")
    } finally {
      java.nio.file.Files.walk(tmp).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
    }
  }
}
