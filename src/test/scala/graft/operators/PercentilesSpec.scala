package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class PercentilesSpec extends SparkSpec {

  test("two-pass bucketed percentiles == builtin exact percentile") {
    val li = Tables(spark, sf0001, "lineitem")
    val got = Percentiles.exact(li, "l_returnflag", "l_extendedprice", Seq(0.25, 0.5, 0.9))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1)
    val exp = li.groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, 0.25)").as("p25"),
        expr("percentile(l_extendedprice, 0.5)").as("p50"),
        expr("percentile(l_extendedprice, 0.9)").as("p90"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(got.length == exp.length)
    got.zip(exp).foreach { case (g, e) =>
      assert(g._1 == e._1)
      assert(math.abs(g._2 - e._2) < 1e-9 && math.abs(g._3 - e._3) < 1e-9 &&
        math.abs(g._4 - e._4) < 1e-9, s"$g vs $e")
    }
  }

  test("single-row groups and p=0/p=1 extremes") {
    import spark.implicits._
    val df = Seq(("a", 5.0), ("b", 1.0), ("b", 2.0), ("b", 3.0)).toDF("k", "v")
    val m = Percentiles.exact(df, "k", "v", Seq(0.0, 1.0)).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(m("a") == ((5.0, 5.0)))
    assert(m("b") == ((1.0, 3.0)))
  }

  test("hot-bucket refinement: mass packed into one pass-1 bucket still ranks exactly") {
    import spark.implicits._
    // 5000 values uniform in [0, 1e-4] against one outlier at 1e6: pass 1's
    // equal-width histogram puts >99.9% of the group in bucket 0, which
    // (with buckets=16 and hotBucketFraction=0.25) trips the refinement —
    // the sub-histogram over [0, 1e-4] must locate the true quantiles.
    val vals = (1 to 5000).map(i => ("hot", i * 2e-8)) :+ (("hot", 1e6))
    val df = vals.toDF("k", "v").repartition(8)
    val got = Percentiles.exact(df, "k", "v", Seq(0.25, 0.5, 0.9), buckets = 16)
      .collect()(0)
    val exp = df.agg(expr("percentile(v, 0.25)"), expr("percentile(v, 0.5)"),
      expr("percentile(v, 0.9)")).collect()(0)
    (1 to 3).foreach(i => assert(math.abs(got.getDouble(i) - exp.getDouble(i - 1)) < 1e-15,
      s"$got vs $exp"))
  }

  test("identical-valued hot bucket answers from the extent, no sort") {
    import spark.implicits._
    // 99% of the group is ONE repeated value — the refined extent is
    // degenerate (min == max), so ranks inside it resolve directly.
    val vals = (1 to 9900).map(_ => ("c", 42.0)) ++ (1 to 100).map(i => ("c", 1000.0 + i))
    val df = vals.toDF("k", "v").repartition(8)
    val got = Percentiles.exact(df, "k", "v", Seq(0.5, 0.99, 1.0), buckets = 16)
      .collect()(0)
    val exp = df.agg(expr("percentile(v, 0.5)"), expr("percentile(v, 0.99)"),
      expr("percentile(v, 1.0)")).collect()(0)
    (1 to 3).foreach(i => assert(math.abs(got.getDouble(i) - exp.getDouble(i - 1)) < 1e-9,
      s"$got vs $exp"))
  }

  test("non-string group keys keep their type") {
    import spark.implicits._
    val df = Seq((1L, 1.0), (1L, 2.0), (2L, 5.0)).toDF("k", "v")
    val out = Percentiles.exact(df, "k", "v", Seq(0.5))
    assert(out.schema("k").dataType == org.apache.spark.sql.types.LongType)
    val m = out.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(m == Map(1L -> 1.5, 2L -> 5.0))
  }

  test("histogram cell cap scales buckets down without losing exactness") {
    import spark.implicits._
    // 50 groups x maxHistCells=2000 forces the pass-1 bucket count down to
    // the 128 floor (2000/50 = 40 < 128) — the driver-side histogram stays
    // bounded and the coarser buckets must still rank exactly.
    val vals = for (g <- 1 to 50; i <- 1 to 200) yield (s"g$g", (i * 7 % 97).toDouble + g)
    val df = vals.toDF("k", "v").repartition(8)
    val got = Percentiles.exact(df, "k", "v", Seq(0.5, 0.9), maxHistCells = 2000L)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).sortBy(_._1)
    val exp = df.groupBy("k")
      .agg(expr("percentile(v, 0.5)").as("p50"), expr("percentile(v, 0.9)").as("p90"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).sortBy(_._1)
    assert(got.length == 50)
    got.zip(exp).foreach { case (g, e) =>
      assert(g._1 == e._1 && math.abs(g._2 - e._2) < 1e-9 && math.abs(g._3 - e._3) < 1e-9,
        s"$g vs $e")
    }
  }

  test("fails loudly past maxGroups distinct keys") {
    import spark.implicits._
    val df = (1 to 500).map(i => (s"g$i", i.toDouble)).toDF("k", "v")
    val err = intercept[IllegalArgumentException] {
      Percentiles.exact(df, "k", "v", Seq(0.5), maxGroups = 100)
    }
    assert(err.getMessage.contains("maxGroups"))
  }

  test("rejects percentiles whose rounded names collide") {
    import spark.implicits._
    val df = Seq(("a", 1.0)).toDF("k", "v")
    val err = intercept[IllegalArgumentException] {
      Percentiles.exact(df, "k", "v", Seq(0.995, 1.0))
    }
    assert(err.getMessage.contains("collide"))
  }
}
