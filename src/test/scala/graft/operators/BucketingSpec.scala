package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Bucketing: pre-partitioned co-located joins — the no-shuffle join path
  * for repeated large-table joins at scale (SURVEY §7.3 flags vega's
  * co-partitioned no-shuffle cogroup; bucketing is the DataFrame-layer
  * equivalent).
  */
class BucketingSpec extends SparkSpec {

  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRec)
    f.delete()
  }

  test("bucketed tables join without an exchange on the bucketed side") {
    // clean any stale managed-table locations from earlier JVMs (the
    // in-memory catalog forgets them but the directories survive)
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    Seq("orders_b", "lineitem_b").foreach { t =>
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) deleteRec(loc)
    }
    Tables(spark, sf0001, "orders")
      .write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("orders_b")
    Tables(spark, sf0001, "lineitem")
      .write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("lineitem_b")

    val joined = spark.table("lineitem_b")
      .join(spark.table("orders_b"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))

    val plan = joined.queryExecution.executedPlan.toString
    // bucketed scan feeds the join directly — no hashpartitioning exchange
    // between scan and join on either side
    val joinIdx = plan.indexOf("SortMergeJoin")
    assert(joinIdx >= 0 || plan.contains("ShuffledHashJoin") || plan.contains("BroadcastHashJoin"),
      s"unexpected join strategy:\n$plan")
    if (joinIdx >= 0) {
      val afterJoin = plan.substring(joinIdx)
      assert(!afterJoin.contains("Exchange hashpartitioning"),
        s"bucketed join still exchanges:\n$plan")
    }
    // and the result is correct
    val expected = Tables(spark, sf0001, "lineitem")
      .join(Tables(spark, sf0001, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
    assert(joined.exceptAll(expected).isEmpty && expected.exceptAll(joined).isEmpty)
  }

  test("pre-partitioned cogroup adds NO exchange beyond the two repartitions " +
      "(vega co_grouped_rdd.rs:103-126 partitioner-aware path)") {
    // Both sides hash-repartitioned on the cogroup key with the same
    // partition count: EnsureRequirements sees the ClusteredDistribution
    // already satisfied, so the per-side aggregation AND the full-outer
    // merge are shuffle-free — the DataFrame-layer equivalent of vega's
    // one-to-one CoGroupedRdd dependency when partitioners match. (The
    // typed groupByKey path keys on an appended closure column, which is
    // why graft expresses cogroup relationally when partitioning reuse
    // matters — SURVEY §7.3.)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val a = Tables(spark, sf0001, "orders")
        .select(col("o_orderkey").as("k"), col("o_totalprice").as("v"))
        .repartition(8, col("k"))
      val b = Tables(spark, sf0001, "lineitem")
        .select(col("l_orderkey").as("k"), col("l_quantity").as("v"))
        .repartition(8, col("k"))
      val ga = a.groupBy("k").agg(count(lit(1)).as("na"))
      val gb = b.groupBy("k").agg(count(lit(1)).as("nb"))
      val cg = ga.join(gb, Seq("k"), "full_outer")
        .select(col("k"), coalesce(col("na"), lit(0L)).as("na"),
          coalesce(col("nb"), lit(0L)).as("nb"))
      cg.collect() // finalize the adaptive plan before inspecting it
      // AdaptiveSparkPlan.toString prints BOTH the final and the initial
      // plan; count exchanges in the final section only
      val full = cg.queryExecution.executedPlan.toString
      val plan = full.indexOf("== Initial Plan ==") match {
        case -1 => full
        case i => full.substring(0, i)
      }
      val nExchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(nExchanges == 2,
        s"expected only the 2 explicit repartitions, got $nExchanges:\n$plan")
      // and the cogrouped counts are right
      val got = cg.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      val expOrders = Tables(spark, sf0001, "orders")
        .groupBy("o_orderkey").count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got.forall { case (k, (na, _)) => expOrders.getOrElse(k, 0L) == na })
      assert(expOrders.forall { case (k, n) => got(k)._1 == n })
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }
}
