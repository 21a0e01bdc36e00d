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

  test("rejects percentiles whose rounded names collide") {
    import spark.implicits._
    val df = Seq(("a", 1.0)).toDF("k", "v")
    val err = intercept[IllegalArgumentException] {
      Percentiles.exact(df, "k", "v", Seq(0.995, 1.0))
    }
    assert(err.getMessage.contains("collide"))
  }
}
