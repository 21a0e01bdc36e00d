package graft.plans

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The plan linter's contract: the two scale-killer shapes throw BEFORE
  * execution; partitioned windows, small global windows, and
  * broadcast-sized cartesians pass; the escape hatch works. The session
  * under test is the shared SparkSpec session, which registers
  * GraftExtensions — i.e. this exercises the REAL injection path, not a
  * hand-constructed rule instance.
  */
class PlanGuardSpec extends SparkSpec {

  private def isGuard(e: Throwable): Boolean =
    e != null && (e.isInstanceOf[PlanGuardViolation] || isGuard(e.getCause))

  private def withCap(key: String, v: String)(body: => Unit): Unit = {
    spark.conf.set(key, v)
    try body finally spark.conf.unset(key)
  }

  private lazy val li = Tables(spark, sf001, "lineitem")
    .select("l_orderkey", "l_linenumber")

  test("un-partitioned window over a large input throws before execution") {
    withCap("spark.graft.planGuard.maxWindowBytes", "1024") {
      val e = intercept[Throwable] {
        li.withColumn("rn", row_number().over(Window.orderBy("l_orderkey")))
          .collect()
      }
      assert(isGuard(e), s"expected PlanGuardViolation, got $e")
    }
  }

  test("partitioned window passes under the same cap") {
    withCap("spark.graft.planGuard.maxWindowBytes", "1024") {
      val n = li.withColumn("rn",
        row_number().over(Window.partitionBy("l_orderkey").orderBy("l_linenumber")))
        .count()
      assert(n > 0)
    }
  }

  test("small global window passes at the default cap") {
    // per-source stats frames and top-k results are the legitimate global-
    // window users — 20 rows must never trip a 1 GiB default
    val small = Tables(spark, sf001, "documents").groupBy("source")
      .agg(count(lit(1)).as("n"))
    assert(small.withColumn("r", row_number().over(Window.orderBy("source")))
      .count() == 20)
  }

  test("cartesian with both sides large throws; broadcast-small side passes") {
    withCap("spark.graft.planGuard.maxCartesianBytes", "1024") {
      val e = intercept[Throwable] { li.crossJoin(li.select("l_orderkey")).count() }
      assert(isGuard(e), s"expected PlanGuardViolation, got $e")
    }
    // at the default 128 MiB cap, one genuinely small side (5-row region)
    // is a legitimate nested-loop probe shape — j3_cartesian's case
    val region = Tables(spark, sf001, "region").select("r_regionkey")
    assert(li.crossJoin(region).count() > 0)
  }

  test("escape hatch disables the guard") {
    withCap("spark.graft.planGuard.maxWindowBytes", "1024") {
      withCap("spark.graft.planGuard.enabled", "false") {
        val n = li.withColumn("rn",
          row_number().over(Window.orderBy("l_orderkey"))).count()
        assert(n > 0)
      }
    }
  }
}
