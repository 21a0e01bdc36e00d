package graft.engine

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck-generator property tests over the Dataflow algebra (SURVEY §5
  * implication: property coverage the reference lacks). Uses Gen directly
  * with fixed seeds (scalatestplus bridge isn't in the offline dep cache).
  */
class PropertiesSpec extends SparkSpec {

  lazy val sc = Session(spark)
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int = 5): Seq[A] =
    (0 until n).flatMap(i =>
      gen.apply(Gen.Parameters.default.withSize(40), Seed(42L + i)))

  private val intLists = Gen.listOf(Gen.chooseNum(-100, 100))
  private val kvLists = Gen.listOf(Gen.zip(Gen.chooseNum(0, 5), Gen.chooseNum(-50, 50)))

  test("distinct().collect().toSet == input.toSet") {
    for (xs <- samples(intLists))
      assert(sc.parallelize(xs, 4).distinct().collect().toSet == xs.toSet)
  }

  test("union.count == a.count + b.count") {
    for (Seq(a, b) <- samples(intLists, 6).grouped(2))
      assert(sc.parallelize(a, 3).union(sc.parallelize(b, 2)).count() ==
        a.size + b.size)
  }

  test("map/filter agree with Scala collections as multisets") {
    for (xs <- samples(intLists)) {
      assert(sc.parallelize(xs, 3).map(_ * 2 + 1).collect().sorted ==
        xs.map(_ * 2 + 1).sorted)
      assert(sc.parallelize(xs, 3).filter(_ % 3 == 0).collect().sorted ==
        xs.filter(_ % 3 == 0).sorted)
    }
  }

  test("reduce(+) == Some(sum) for non-empty, None for empty") {
    for (xs <- samples(intLists) :+ List.empty[Int]) {
      val got = sc.parallelize(xs, 3).reduce(_ + _)
      if (xs.isEmpty) assert(got.isEmpty) else assert(got.contains(xs.sum))
    }
  }

  test("intersection == set intersect; subtract == set diff") {
    for (Seq(a, b) <- samples(intLists, 6).grouped(2)) {
      val fa = sc.parallelize(a, 3)
      val fb = sc.parallelize(b, 2)
      assert(fa.intersection(fb).collect().toSet == a.toSet.intersect(b.toSet))
      assert(fa.subtract(fb).collect().toSet == a.toSet.diff(b.toSet))
    }
  }

  test("reduceByKey(+) == groupBy-sum reference") {
    for (kvs <- samples(kvLists)) {
      val got = sc.parallelize(kvs, 3).pairs[Int, Int]
        .reduceByKey(_ + _).collect().toMap
      val expected = kvs.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      assert(got == expected)
    }
  }

  test("repartition/coalesce preserve multiset") {
    for (xs <- samples(intLists)) {
      val flow = sc.parallelize(xs, 4)
      assert(flow.repartition(3).collect().sorted == xs.sorted)
      assert(flow.coalesce(2).collect().sorted == xs.sorted)
    }
  }
}
