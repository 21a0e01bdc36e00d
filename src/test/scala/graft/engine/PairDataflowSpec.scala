package graft.engine

import graft.SparkSpec

/** Port of the reference's pair-op tests (vega tests/test_pair_rdd.rs). */
class PairDataflowSpec extends SparkSpec {

  lazy val sc = Session(spark)
  import spark.implicits._

  test("group_by_key (test_pair_rdd.rs:9-37)") {
    val pairs = sc.parallelize(
      (1 to 7).map(("x", _)) ++ (1 to 8).map(("y", _)), 4).pairs
    val grouped = pairs.groupByKey().collect().toMap
    assert(grouped("x").sorted == (1 to 7))
    assert(grouped("y").sorted == (1 to 8))
  }

  test("join inner cross-product of grouped values (test_pair_rdd.rs:40-82)") {
    val left = sc.parallelize(Seq(
      (1, ("A", "B")), (2, ("C", "D")), (3, ("E", "F")), (4, ("G", "H"))), 4).pairs
    val right = sc.parallelize(Seq(
      (1, "A1"), (1, "A2"), (2, "B1"), (2, "B2"), (3, "C1"), (3, "C2")), 4).pairs
    val joined = left.join(right).collect().sortBy(x => (x._1, x._2._2))
    assert(joined == Seq(
      (1, (("A", "B"), "A1")), (1, (("A", "B"), "A2")),
      (2, (("C", "D"), "B1")), (2, (("C", "D"), "B2")),
      (3, (("E", "F"), "C1")), (3, (("E", "F"), "C2"))))
  }

  test("self-join works (shared lineage)") {
    val p = sc.parallelize(Seq((1, "a"), (1, "b"), (2, "c")), 2).pairs
    val joined = p.join(p).collect().sorted
    assert(joined == Seq(
      (1, ("a", "a")), (1, ("a", "b")), (1, ("b", "a")), (1, ("b", "b")),
      (2, ("c", "c"))))
  }

  test("count_by_value over pairs (test_pair_rdd.rs:85-109)") {
    val col = sc.parallelize(Seq(("a", 1), ("a", 1), ("b", 2)), 2)
    assert(col.countByValue().collect().toMap ==
      Map(("a", 1) -> 2L, ("b", 2) -> 1L))
  }

  test("group_by with key function (test_pair_rdd.rs:112-135)") {
    val words = sc.parallelize(Seq("apple", "avocado", "banana", "blue", "cherry"), 2)
    val grouped = words.groupBy(_.substring(0, 1)).collect().toMap
    assert(grouped("a").toSet == Set("apple", "avocado"))
    assert(grouped("b").toSet == Set("banana", "blue"))
    assert(grouped("c").toSet == Set("cherry"))
  }

  test("reduce_by_key (pair_rdd.rs:54-80)") {
    val pairs = sc.parallelize(Seq(("a", 1), ("b", 2), ("a", 2), ("c", 5), ("a", 3)), 2).pairs
    assert(pairs.reduceByKey(_ + _).collect().toMap ==
      Map("a" -> 6, "b" -> 2, "c" -> 5))
  }

  test("combine_by_key builds combiners (pair_rdd.rs:20-33)") {
    val pairs = sc.parallelize(Seq(("a", 1), ("b", 2), ("a", 2), ("c", 5), ("a", 3)), 2).pairs
    val combined = pairs.combineByKey[Seq[Int]](
      v => Seq(v), (c, v) => c :+ v, (c1, c2) => c1 ++ c2)
    assert(combined.collect().toMap.view.mapValues(_.sorted).toMap ==
      Map("a" -> Seq(1, 2, 3), "b" -> Seq(2), "c" -> Seq(5)))
  }

  test("map_values / flat_map_values (pair_rdd.rs:82-102)") {
    val pairs = sc.parallelize(Seq(("a", 2), ("b", 3)), 2).pairs
    assert(pairs.mapValues(_ * 10).ds.collect().toMap == Map("a" -> 20, "b" -> 30))
    val fm = pairs.flatMapValues(v => 1 to v).ds.collect()
    assert(fm.sorted.toSeq == Seq(("a", 1), ("a", 2), ("b", 1), ("b", 2), ("b", 3)))
  }

  test("cogroup collects both sides (co_grouped_rdd.rs)") {
    val a = sc.parallelize(Seq((1, "x"), (1, "y"), (2, "z")), 2).pairs
    val b = sc.parallelize(Seq((1, 10), (3, 30)), 2).pairs
    val cg = a.cogroup(b).collect().toMap
    assert(cg(1)._1.sorted == Seq("x", "y") && cg(1)._2 == Seq(10))
    assert(cg(2)._1 == Seq("z") && cg(2)._2.isEmpty)
    assert(cg(3)._1.isEmpty && cg(3)._2 == Seq(30))
  }

  test("partition_by_key (pair_rdd.rs:157-171)") {
    val pairs = sc.parallelize((1 to 100).map(i => (i % 10, i)), 7).pairs
    val p = pairs.partitionByKey(5)
    assert(p.toDataflow.numPartitions == 5)
    assert(p.toDataflow.count() == 100)
  }
}
