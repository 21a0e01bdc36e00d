package graft.engine

import graft.SparkSpec

/** Port of the reference's operator golden tests (vega tests/test_rdd.rs),
  * same inputs and expected values, per FIXTURES.md §A.
  */
class DataflowSpec extends SparkSpec {

  lazy val sc = Session(spark)
  import spark.implicits._

  test("make_rdd + collect preserves order (test_rdd.rs:46-50)") {
    assert(sc.makeRdd(Seq(1, 2, 3, 4)).collect() == Seq(1, 2, 3, 4))
  }

  test("distinct dedups (test_rdd.rs:52-53, 286-322)") {
    val col = sc.parallelize(Seq(1, 1, 2, 2, 3, 3, 4, 4), 2)
    assert(col.distinct().collect().sorted == Seq(1, 2, 3, 4))
    assert(col.distinct(3).collect().sorted == Seq(1, 2, 3, 4))
  }

  test("basic ops: map/flatMap/filter/glom/fold/reduce (test_rdd.rs:56-135)") {
    val nums = sc.parallelize(Seq(1, 2, 3, 4), 2)
    assert(nums.map(_ * 2).collect().sorted == Seq(2, 4, 6, 8))
    assert(nums.flatMap(n => Seq.fill(n)(n)).collect().sorted ==
      Seq(1, 2, 2, 3, 3, 3, 4, 4, 4, 4))
    assert(nums.filter(_ % 2 == 0).collect().sorted == Seq(2, 4))
    assert(nums.glom().collect().map(_.toSet).toSet == Set(Set(1, 2), Set(3, 4)))
    assert(nums.fold(0)(_ + _) == 10)
    assert(nums.reduce(_ + _).contains(10))
    assert(sc.parallelize(Seq.empty[Int], 2).reduce(_ + _).isEmpty)
  }

  test("mapPartitions sums per split (test_rdd.rs:99-111)") {
    val nums = sc.parallelize(Seq(1, 2, 3, 4), 2)
    assert(nums.mapPartitions(it => Iterator.single(it.sum)).collect().sum == 10)
    val withIdx = nums.mapPartitionsWithIndex((i, it) => it.map(v => (i, v)))
    assert(withIdx.collect().map(_._2).sorted == Seq(1, 2, 3, 4))
  }

  test("aggregate to a different result type (test_rdd.rs:138-176)") {
    val pairs = sc.parallelize(Seq(("a", 1), ("b", 2), ("a", 2), ("c", 5), ("a", 3)), 2)
    val agg = pairs.aggregate(0)((acc, kv) => acc + kv._2, _ + _)
    assert(agg == 13)
  }

  test("take / first (test_rdd.rs:179-213)") {
    val nums = sc.parallelize(1 to 100, 4)
    assert(nums.take(5).length == 5)
    assert(nums.take(0).isEmpty)
    assert(nums.first() == 1)
  }

  test("sample is seed-deterministic (test_rdd.rs:325-351)") {
    val col = sc.parallelize(0 until 100, 5)
    val a = col.sample(withReplacement = false, 0.2, seed = 123).collect()
    val b = col.sample(withReplacement = false, 0.2, seed = 123).collect()
    assert(a == b)
    assert(a.nonEmpty && a.length < 100)
    val ts = col.takeSample(withReplacement = false, num = 10, seed = 123)
    assert(ts.length == 10 && ts.distinct.length == 10)
  }

  test("cartesian (test_rdd.rs:354-362)") {
    val a = sc.parallelize(Seq(1, 2), 2)
    val b = sc.parallelize(Seq("x", "y"), 2)
    assert(a.cartesian(b).collect().toSet ==
      Set((1, "x"), (1, "y"), (2, "x"), (2, "y")))
  }

  test("coalesce / repartition preserve content (test_rdd.rs:365-385)") {
    val nums = sc.parallelize(1 to 20, 8)
    val c = nums.coalesce(2)
    assert(c.numPartitions == 2 && c.collect().sorted == (1 to 20))
    val r = nums.repartition(5)
    assert(r.numPartitions == 5 && r.collect().sorted == (1 to 20))
  }

  test("union keeps duplicates (test_rdd.rs:388-456)") {
    val a = sc.parallelize(Seq(1, 2, 3), 2)
    val b = sc.parallelize(Seq(3, 4, 5), 2)
    assert(a.union(b).collect().sorted == Seq(1, 2, 3, 3, 4, 5))
    assert(sc.union(Seq(a, b, a)).count() == 9)
  }

  test("zip positional (test_rdd.rs:459-482)") {
    val a = sc.parallelize(Seq(1, 2, 3), 3)
    val b = sc.parallelize(Seq("a", "b", "c"), 3)
    val zipped = a.zip(b).collect()
    assert(zipped.map(_._1).sorted == Seq(1, 2, 3))
    assert(zipped.toMap == Map(1 -> "a", 2 -> "b", 3 -> "c"))
  }

  test("intersection set-semantics (test_rdd.rs:485-521)") {
    val c1 = sc.parallelize(Seq(1, 2, 3, 4, 5, 10, 12, 13, 19, 0), 4)
    val c2 = sc.parallelize(Seq(3, 4, 5, 6, 7, 8, 11, 13), 4)
    assert(c1.intersection(c2).collect().sorted == Seq(3, 4, 5, 13))
  }

  test("range is end-inclusive (test_rdd.rs:524-531)") {
    assert(sc.range(1, 12, 1, 3).collect().sorted == (1L to 12L))
    assert(sc.range(5, 5).collect() == Seq(5L))
    intercept[IllegalArgumentException](sc.range(10, 0, -1))
  }

  test("approx count final == exact (test_rdd.rs:534-587)") {
    val col = sc.range(1, 10000, 1, 32)
    val pr = col.countApprox(60000, 0.95)
    assert(pr.getFinalValue().mean.toLong == 10000L)
  }

  test("approx count PARTIAL path: initial value on a slow job is not final " +
      "(approximate_action_listener.rs:56-80)") {
    // 8 partitions that each sleep well past the approx timeout: the
    // initial value must be the non-final partial estimate, and only
    // getFinalValue blocks for the exact count.
    val slow = sc.parallelize(1 to 400, 8).mapPartitions { it =>
      Thread.sleep(500); it
    }
    val pr = slow.countApprox(timeoutMs = 60, confidence = 0.9)
    val init = pr.initialValue
    assert(!pr.isInitialValueFinal,
      "a job sleeping 500ms/partition cannot be final after a 60ms timeout")
    // the partial estimate may be degenerate (no partition finished) but its
    // interval must always be well-formed
    assert(init.low <= init.high)
    val fin = pr.getFinalValue()
    assert(fin.mean == 400.0)
    assert(fin.low <= 400.0 && 400.0 <= fin.high)
  }

  test("grouped approx PARTIAL path: non-final on a slow job, final exact per key " +
      "(grouped_count_evaluator.rs)") {
    val slow = sc.parallelize((1 to 300).map(i => i % 3), 8).mapPartitions { it =>
      Thread.sleep(500); it
    }
    val pr = slow.countByValueApproxPartial(timeoutMs = 60, confidence = 0.9)
    pr.initialValue // force the timeout-bounded estimate
    assert(!pr.isInitialValueFinal)
    val fin = pr.getFinalValue()
    assert(fin.keySet == Set(0, 1, 2))
    assert(fin.values.forall(_.mean.round == 100L))
  }

  test("is_empty / max / min / key_by (test_rdd.rs:590-620)") {
    val col = sc.parallelize(Seq(13, 28, 3, 4, 51, 108, 12, 113, 19), 4)
    assert(!col.isEmpty)
    assert(sc.parallelize(Seq.empty[Int], 1).isEmpty)
    assert(col.max().contains(113) && col.min().contains(3))
    // vega key_by emits (item, key) — rdd.rs:1065-1068
    val kb = sc.parallelize(Seq(1, 2, 3), 2).keyBy(_ % 2).collect()
    assert(kb.toSet == Set((1, 1), (2, 0), (3, 1)))
  }

  test("random_split: disjoint, sizes within tolerance (test_rdd.rs:623-652)") {
    val col = sc.range(1, 600, 1, 6)
    val Array(a, b) = col.randomSplit(Array(0.7, 0.3), seed = 42)
    val (sa, sb) = (a.collect().toSet, b.collect().toSet)
    assert(sa.intersect(sb).isEmpty)
    assert(sa.size + sb.size == 600)
    assert(math.abs(sa.size - 420) < 50)
  }

  test("top / takeOrdered (test_rdd.rs:655-673)") {
    val col = sc.parallelize(Seq(13, 28, 3, 4, 51, 108, 12, 113, 19), 4)
    assert(col.top(3) == Seq(113, 108, 51))
    assert(col.takeOrdered(3) == Seq(3, 4, 12))
  }

  test("subtract set-semantics (test_rdd.rs:676-699)") {
    val c1 = sc.parallelize(Seq(1, 2, 3, 4, 5, 10, 12, 13, 19, 0), 4)
    val c2 = sc.parallelize(Seq(3, 4, 5, 6, 7, 8, 11, 13), 4)
    assert(c1.subtract(c2).collect().sorted == Seq(0, 1, 2, 10, 12, 19))
  }

  test("countByValue returns a flow of (value, count) (test_rdd.rs:450-459)") {
    val col = sc.parallelize(Seq("a", "b", "a", "c", "a"), 2)
    assert(col.countByValue().collect().toMap == Map("a" -> 3L, "b" -> 1L, "c" -> 1L))
  }

  test("countByValueApprox final == exact") {
    val col = sc.parallelize(Seq("a", "b", "a", "c", "a"), 2)
    val m = col.countByValueApprox(60000)
    assert(m.view.mapValues(_.mean.toLong).toMap == Map("a" -> 3L, "b" -> 1L, "c" -> 1L))
  }

  test("sortBy orders globally (extension, SURVEY §2.9)") {
    val col = sc.parallelize(Seq(13, 28, 3, 4, 51, 108, 12, 113, 19), 4)
    assert(col.sortBy(identity[Int]).collect() == Seq(3, 4, 12, 13, 19, 28, 51, 108, 113))
    assert(col.sortBy(identity[Int], ascending = false).collect().head == 113)
  }

  test("saveAsTextFile writes part files (rdd.rs:254-272)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-text").toString + "/out"
    sc.parallelize(Seq(1, 2, 3, 4), 2).saveAsTextFile(dir)
    val back = sc.textFile(dir).map(_.toInt).collect().sorted
    assert(back == Seq(1, 2, 3, 4))
  }
}
