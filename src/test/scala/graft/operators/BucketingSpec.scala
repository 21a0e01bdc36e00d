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
}
