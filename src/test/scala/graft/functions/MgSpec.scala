package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Misra-Gries kernel invariants — all DETERMINISTIC (no probability to
  * budget, unlike CMS): est <= exact always, exact - est <= (N-M)/(K+1),
  * heavy keys present, and the PODS'12 merge preserves the bound for any
  * split of the stream.
  */
class MgSpec extends AnyFunSuite {

  private def exactCounts(xs: Seq[Long]): Map[Long, Long] =
    xs.groupBy(identity).map { case (k, v) => (k, v.length.toLong) }

  private def build(xs: Seq[Long]): MisraGries.State = {
    val st = MisraGries.empty
    xs.foreach(MisraGries.add(st, _))
    st
  }

  private def assertInvariants(st: MisraGries.State, xs: Seq[Long]): Unit = {
    val exact = exactCounts(xs)
    val bound = (st.n - st.m).toDouble / (MisraGries.K + 1)
    assert(st.n === xs.length.toLong)
    for ((k, ex) <- exact) {
      val est = MisraGries.query(st, k)
      assert(est <= ex, s"key $k overcounted: est $est > exact $ex")
      assert(ex - est <= bound,
        s"key $k outside the deterministic bound: exact $ex est $est bound $bound")
    }
    // every key above the bound is present
    for ((k, ex) <- exact if ex > bound)
      assert(MisraGries.query(st, k) > 0, s"heavy key $k (exact $ex) absent")
  }

  // seeded skewed stream: 8 heavy keys + a long uniform tail
  private def stream(seed: Int, n: Int): Seq[Long] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { _ =>
      if (rnd.nextInt(4) == 0) rnd.nextInt(8).toLong
      else 100L + rnd.nextInt(5000)
    }
  }

  test("sequential build: one-sided, bounded, heavy keys present") {
    val xs = stream(1, 50000)
    assertInvariants(build(xs), xs)
  }

  test("merge of arbitrary splits preserves the bound (PODS'12)") {
    val xs = stream(2, 60000)
    for (pieces <- Seq(2, 7, 32)) {
      val parts = xs.grouped(math.max(1, xs.length / pieces)).toSeq
      val merged = MisraGries.empty
      parts.foreach(p => MisraGries.mergeInto(merged, build(p)))
      assertInvariants(merged, xs)
    }
  }

  test("byte round-trip is canonical and lossless") {
    val st = build(stream(3, 20000))
    val bytes = MisraGries.toBytes(st)
    val back = MisraGries.fromBytes(bytes)
    assert(back.n === st.n)
    assert(back.m === st.m)
    // canonical: serialize(deserialize(bytes)) == bytes regardless of
    // HashMap iteration order
    assert(java.util.Arrays.equals(MisraGries.toBytes(back), bytes))
  }

  test("foreign or mis-shaped bytes are rejected with a clear error") {
    intercept[IllegalArgumentException] {
      MisraGries.fromBytes(Array[Byte](1, 2, 3))
    }
    val good = MisraGries.toBytes(build(Seq(1L, 2L, 3L)))
    val wrongMagic = good.clone(); wrongMagic(0) = 'X'
    intercept[IllegalArgumentException](MisraGries.fromBytes(wrongMagic))
    val truncated = java.util.Arrays.copyOf(good, good.length - 8)
    intercept[IllegalArgumentException](MisraGries.fromBytes(truncated))
  }

  test("a summary never holds more than K counters") {
    val st = build((0L until 100000L).map(_ % 9973))
    assert(st.map.size() <= MisraGries.K)
  }

  test("K is a per-summary budget: bounds hold at K=8 and K=256, and tighten with K") {
    val xs = stream(4, 40000)
    val exact = exactCounts(xs)
    def boundAt(k: Int): Double = {
      val st = MisraGries.empty(k)
      xs.foreach(MisraGries.add(st, _))
      val bound = (st.n - st.m).toDouble / (k + 1)
      for ((key, ex) <- exact) {
        val est = MisraGries.query(st, key)
        assert(est <= ex && ex - est <= bound,
          s"K=$k key $key: est $est exact $ex bound $bound")
      }
      // wire round-trip preserves the summary's own K
      assert(MisraGries.fromBytes(MisraGries.toBytes(st)).k === k)
      bound
    }
    assert(boundAt(256) < boundAt(8), "a larger budget must tighten the bound")
  }

  test("merging mixed-K summaries is refused") {
    val a = MisraGries.empty(8); MisraGries.add(a, 1L)
    val b = MisraGries.empty(16); MisraGries.add(b, 2L)
    intercept[IllegalArgumentException](MisraGries.mergeInto(a, b))
    // an unset merge buffer adopts the first input's K, then enforces it
    val u = MisraGries.unset
    MisraGries.mergeInto(u, a)
    assert(u.k === 8)
    intercept[IllegalArgumentException](MisraGries.mergeInto(u, b))
  }
}
