package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Count-min sketch kernel: one-sided bound, merge bit-identity, wire
  * format validation. Pure JVM — no Spark session needed.
  */
class CmsSpec extends AnyFunSuite {

  private def hash(k: Long): Long = {
    // xxhash64-ish stand-in: any well-mixed 64-bit function works, the
    // sketch only sees the hash
    var h = k * 0x9e3779b97f4a7c15L
    h ^= h >>> 32; h *= 0xff51afd7ed558ccdL; h ^= h >>> 32
    h
  }

  test("estimates are never below true counts; heavy keys near-exact") {
    val buf = CountMin.emptySketch
    val counts = (0L until 200L).map(k => k -> (1L + k % 17)).toMap
    for ((k, c) <- counts; _ <- 0L until c) CountMin.add(buf, hash(k), 1L)
    val n = counts.values.sum
    val bound = math.E / CountMin.W * n
    var over = 0
    for ((k, c) <- counts) {
      val est = CountMin.query(buf, hash(k))
      assert(est >= c, s"key $k: est $est below true $c")
      if (est > c + bound) over += 1
    }
    assert(over <= counts.size / 10, s"$over/${counts.size} over the CM bound")
    // a dominant heavy key in a sparse sketch estimates exactly
    val heavy = CountMin.emptySketch
    for (_ <- 0 until 5000) CountMin.add(heavy, hash(42L), 1L)
    CountMin.add(heavy, hash(7L), 1L)
    assert(CountMin.query(heavy, hash(42L)) === 5000L)
  }

  test("merge of parts is bit-identical to direct; add is increment-weighted") {
    val direct = CountMin.emptySketch
    val p1 = CountMin.emptySketch
    val p2 = CountMin.emptySketch
    for (k <- 0L until 500L) {
      CountMin.add(direct, hash(k), 1L)
      CountMin.add(if (k % 2 == 0) p1 else p2, hash(k), 1L)
    }
    CountMin.mergeInto(p1, p2)
    assert(java.util.Arrays.equals(CountMin.toBytes(p1), CountMin.toBytes(direct)))
    // weighted add == repeated unit add
    val w1 = CountMin.emptySketch
    val w2 = CountMin.emptySketch
    CountMin.add(w1, hash(9L), 5L)
    for (_ <- 0 until 5) CountMin.add(w2, hash(9L), 1L)
    assert(java.util.Arrays.equals(CountMin.toBytes(w1), CountMin.toBytes(w2)))
  }

  test("wire format round-trips and rejects foreign bytes") {
    val buf = CountMin.emptySketch
    for (k <- 0L until 100L) CountMin.add(buf, hash(k), 1L)
    val bytes = CountMin.toBytes(buf)
    assert(CountMin.fromBytes(bytes).toSeq === buf.toSeq)
    intercept[IllegalArgumentException](CountMin.fromBytes(Array[Byte](1, 2, 3)))
    val wrongMagic = bytes.clone(); wrongMagic(0) = 'X'
    intercept[IllegalArgumentException](CountMin.fromBytes(wrongMagic))
    intercept[IllegalArgumentException](
      CountMin.fromBytes(bytes.dropRight(8))) // truncated payload
  }
}
