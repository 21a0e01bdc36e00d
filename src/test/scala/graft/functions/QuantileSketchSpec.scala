package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** graft_qsketch: mergeable grouped quantiles. Accuracy contract is on
  * RANK, not value: for estimate v̂ of quantile p, the fraction of the
  * group's values ≤ v̂ must sit within ~2/k of p regardless of partition
  * layout (merge order shifts which ranks the centroids cut at, never the
  * bound).
  */
class QuantileSketchSpec extends SparkSpec {

  private def rankErrors(df: org.apache.spark.sql.DataFrame, key: String,
      value: String, ps: Seq[Double], k: Int): Seq[Double] = {
    GraftFunctions.register(spark)
    val est = df.groupBy(col(key).as("k"))
      .agg(GraftFunctions.graft_qsketch(col(value).cast("double"), k, ps).as("qs"))
    val rows = df.select(col(key).as("k"), col(value).cast("double").as("v"))
      .join(est, "k")
    // bracketed: on tied data the CDF jumps, so error is how far p falls
    // OUTSIDE [P(v < est), P(v <= est)], not distance from a point rank
    ps.indices.flatMap { i =>
      val est_ = element_at(col("qs"), i + 1)
      rows.groupBy("k")
        .agg((sum(when(col("v") < est_, 1.0).otherwise(0.0)) / count(lit(1))).as("lo"),
          (sum(when(col("v") <= est_, 1.0).otherwise(0.0)) / count(lit(1))).as("hi"))
        .collect().map(r =>
          math.max(0.0, math.max(r.getDouble(1) - ps(i), ps(i) - r.getDouble(2))))
    }
  }

  test("rank error bounded on real data, many partitionings") {
    val li = Tables(spark, sf0001, "lineitem")
    for (parts <- Seq(1, 7, 32)) {
      val errs = rankErrors(li.repartition(parts), "l_returnflag",
        "l_extendedprice", Seq(0.1, 0.5, 0.9), k = 256)
      assert(errs.max < 2.0 / 256 * 3, s"parts=$parts max rank err ${errs.max}")
    }
  }

  test("heavy duplicates keep exact-valued centroids") {
    import spark.implicits._
    // 90% of the group is one value: p50 must return it EXACTLY
    val df = ((1 to 9000).map(_ => ("a", 42.0)) ++
      (1 to 1000).map(i => ("a", 1000.0 + i))).toDF("k", "v").repartition(16)
    GraftFunctions.register(spark)
    val got = df.groupBy("k")
      .agg(GraftFunctions.graft_qsketch(col("v"), 64, Seq(0.5)).as("qs"))
      .select(element_at(col("qs"), 1)).first().getDouble(0)
    assert(got == 42.0, s"p50 of 90%-constant group was $got")
  }

  test("high-cardinality grouped quantiles stay distributed and bounded") {
    val li = Tables(spark, sf0001, "lineitem")
    // l_partkey: the regime Percentiles.exact refuses (hundreds of groups
    // here; millions at scale) — sketch must agree with per-group exact
    GraftFunctions.register(spark)
    val est = li.groupBy("l_partkey")
      .agg(GraftFunctions.graft_qsketch(col("l_quantity").cast("double"),
        128, Seq(0.5)).as("qs"))
      .select(col("l_partkey"), element_at(col("qs"), 1).as("p50"))
    val exact = li.groupBy("l_partkey")
      .agg(expr("percentile(l_quantity, 0.5)").as("e50"),
        count(lit(1)).as("n"))
    val joined = est.join(exact, "l_partkey").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (p50, e50, n) = (r.getDouble(1), r.getDouble(2), r.getLong(3))
      // groups at or under k skip compaction entirely, so the type-7
      // arithmetic must match builtin percentile to float precision —
      // no blanket slack, or this contract is never actually enforced
      val tol = if (n <= 128) 1e-9 else (e50.abs + 1) * 0.2
      assert(math.abs(p50 - e50) <= tol,
        s"part ${r.get(0)}: sketch $p50 vs exact $e50 (n=$n)")
    }
  }

  test("null values are skipped; empty input yields NaN") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = Seq(("a", Some(1.0)), ("a", None), ("a", Some(3.0)))
      .toDF("k", "v")
    val got = df.groupBy("k")
      .agg(GraftFunctions.graft_qsketch(col("v"), 64, Seq(0.5)).as("qs"))
      .select(element_at(col("qs"), 1)).first().getDouble(0)
    assert(got == 2.0, s"p50 of {1, 3} with a null was $got")
    val empty = df.where(col("v").isNull).groupBy("k")
      .agg(GraftFunctions.graft_qsketch(col("v"), 64, Seq(0.5)).as("qs"))
      .select(element_at(col("qs"), 1)).first().getDouble(0)
    assert(empty.isNaN)
  }

  test("readable failures for DECIMAL quantile literals and NaN") {
    GraftFunctions.register(spark)
    Tables(spark, sf0001, "lineitem").createOrReplaceTempView("li_qs_guard")
    // bare 0.5 parses as DECIMAL — must fail analysis with the hint, not a
    // raw ClassCastException out of the lazy ps evaluation
    val err = intercept[Exception] {
      spark.sql("SELECT graft_qsketch(CAST(l_quantity AS DOUBLE), 128, array(0.5)) " +
        "FROM li_qs_guard").collect()
    }
    assert(err.getMessage.contains("array<double>"), err.getMessage)
    val nan = intercept[Exception] {
      spark.sql("SELECT graft_qsketch(CAST(l_quantity AS DOUBLE), 128, " +
        "array(double('NaN'))) FROM li_qs_guard").collect()
    }
    assert(nan.getMessage.contains("[0, 1]"), nan.getMessage)
  }

  test("SQL surface: graft_qsketch callable from spark.sql") {
    GraftFunctions.register(spark)
    Tables(spark, sf0001, "lineitem").createOrReplaceTempView("li_qs")
    val r = spark.sql(
      """SELECT l_returnflag,
        |graft_qsketch(CAST(l_quantity AS DOUBLE), 128, array(0.5D, 0.9D)) AS qs
        |FROM li_qs GROUP BY l_returnflag""".stripMargin).collect()
    assert(r.length >= 3 && r.forall(_.getSeq[Double](1).length == 2))
  }

  test("stored digests (state -> parquet -> merged) answer inside the rank bound") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    GraftFunctions.register(spark)
    import GraftFunctions.{graft_qsketch_merged, graft_qsketch_state}
    val k = 128
    val df = (1 to 20000).map(i => (i % 13, (i * 37 % 10007).toDouble)).toDF("g", "v")
    val tmp = java.nio.file.Files.createTempDirectory("qsk-spec")
    try {
      df.groupBy("g").agg(graft_qsketch_state(col("v"), k).as("d"))
        .write.mode("overwrite").parquet(tmp.resolve("d").toString)
      val qs = spark.read.parquet(tmp.resolve("d").toString)
        .agg(graft_qsketch_merged(col("d"), k, Seq(0.5, 0.9)).as("qs"))
        .collect()(0).getSeq[Double](0)
      val vs = df.select("v").as[Double].collect().sorted
      def trueRank(x: Double): Double = vs.count(_ <= x).toDouble / vs.length
      assert(math.abs(trueRank(qs(0)) - 0.5) <= 6.0 / k + 1.0 / vs.length,
        s"p50=${qs(0)} rank=${trueRank(qs(0))}")
      assert(math.abs(trueRank(qs(1)) - 0.9) <= 6.0 / k + 1.0 / vs.length,
        s"p90=${qs(1)} rank=${trueRank(qs(1))}")
    } finally {
      java.nio.file.Files.walk(tmp).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
    }
  }
}
