package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Edge semantics of the round-4 relational extensions — the cases the
  * sf-gate can't isolate because the fixtures never hit them.
  */
class RelationalExtensionsSpec extends SparkSpec {

  test("cdc latest-wins: equal timestamps break ties by event_id") {
    import spark.implicits._
    val changes = Seq(
      // user 1: tie on ts — event_id 7 must win over 3
      (1L, 100L, 3L, "a"), (1L, 100L, 7L, "b"), (1L, 50L, 9L, "c"),
      // user 2: plain latest-ts
      (2L, 10L, 1L, "x"), (2L, 20L, 2L, "y"))
      .toDF("user_id", "ts", "event_id", "payload")
    val latest = changes.groupBy("user_id")
      .agg(max_by(struct(col("ts"), col("payload")),
        struct(col("ts"), col("event_id"))).as("last"))
      .select(col("user_id"), col("last.payload").as("payload"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(latest == Map(1L -> "b", 2L -> "y"))
  }

  test("pivot: missing (group, value) combinations surface as null") {
    import spark.implicits._
    val df = Seq(("r1", "F", 1), ("r1", "O", 2), ("r2", "F", 3))
      .toDF("g", "p", "v")
    val wide = df.groupBy("g").pivot("p", Seq("F", "O")).agg(sum("v"))
      .orderBy("g").collect()
    assert(wide(1).isNullAt(wide(1).fieldIndex("O")),
      "absent pivot cell must be null (queries coalesce it to 0 explicitly)")
  }

  test("unionByName aligns by name and nulls missing columns") {
    import spark.implicits._
    val v2 = Seq(("s1", 1.0)).toDF("seg", "bal")
    val v1 = Seq(2.0).toDF("bal") // older schema: no seg, different arity
    val u = v2.unionByName(v1, allowMissingColumns = true).orderBy("bal").collect()
    assert(u(0).getString(0) == "s1" && u(0).getDouble(1) == 1.0)
    assert(u(1).isNullAt(0) && u(1).getDouble(1) == 2.0)
  }

  test("cube grouping_id bitmask: first grouping column is the high bit") {
    import spark.implicits._
    val df = Seq(("a", "x")).toDF("c1", "c2")
    val gids = df.cube("c1", "c2")
      .agg(grouping_id().as("gid"))
      .select(
        when(col("c1").isNull, 1).otherwise(0).as("n1"),
        when(col("c2").isNull, 1).otherwise(0).as("n2"),
        col("gid"))
      .collect()
    gids.foreach { r =>
      assert(r.getAs[Any]("gid").toString.toInt == (r.getInt(0) << 1 | r.getInt(1)),
        s"gid mismatch: $r — DuckDB GROUPING(a,b) uses this order, both must agree")
    }
  }
}
