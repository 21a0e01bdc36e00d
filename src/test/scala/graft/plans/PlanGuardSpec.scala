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

  /** Assert the optimized plan still CONTAINS a Window before acting on it.
    * Catalyst's ColumnPruning (which runs before user-injected rules)
    * deletes a Window whose expressions nothing references — a pass-arm
    * that counts an unreferenced window column proves only that pruning
    * works, not that the guard lets the partitioned shape through. Every
    * pass arm below references the window column in the action AND pins
    * the node's survival, so the guard is genuinely exercised.
    */
  private def countWithWindowPinned(df: org.apache.spark.sql.DataFrame): Long = {
    val survived = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(survived.nonEmpty, "Window was pruned — pass arm would be vacuous")
    df.count()
  }

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
      val n = countWithWindowPinned(li.withColumn("rn",
        row_number().over(Window.partitionBy("l_orderkey").orderBy("l_linenumber")))
        .where(col("rn") >= 1))
      assert(n > 0)
    }
  }

  test("small global window passes at the default cap") {
    // per-source stats frames and top-k results are the legitimate global-
    // window users — 20 rows must never trip a 1 GiB default
    val small = Tables(spark, sf001, "documents").groupBy("source")
      .agg(count(lit(1)).as("n"))
    assert(countWithWindowPinned(
      small.withColumn("r", row_number().over(Window.orderBy("source")))
        .where(col("r") >= 1)) == 20)
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
        val n = countWithWindowPinned(li.withColumn("rn",
          row_number().over(Window.orderBy("l_orderkey")))
          .where(col("rn") >= 1))
        assert(n > 0)
      }
    }
  }

  test("lambda-indexed DERIVED array throws; element-wise transform passes") {
    // scan-backed frame: a Seq-backed LocalRelation would be folded away
    // by ConvertToLocalRelation before the guard ever sees a lambda
    val docs = Tables(spark, sf001, "documents").select("doc_id", "text")
    val n = docs.count()
    // the x_cdc_chunks trap: element_at over an array whose derivation
    // (split) collapses INTO the lambda
    val trap = docs.select(col("doc_id"),
      filter(sequence(lit(1), size(split(col("text"), " "))), i =>
        length(element_at(split(col("text"), " "), i.cast("int"))) > 1)
        .as("hits"))
    // every action below REFERENCES hits: a bare count() lets
    // ColumnPruning delete the lambda before the guard can see it (the
    // same vacuous-pass trap countWithWindowPinned guards against)
    def touch(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(sum(size(col("hits")))).first().getLong(0)
    val e = intercept[Throwable](touch(trap))
    assert(isGuard(e), s"expected PlanGuardViolation, got $e")
    // the correct shape: transform over the array's ELEMENTS
    val ok = docs.select(col("doc_id"),
      filter(split(col("text"), " "), w => length(w) > 1).as("hits"))
    assert(touch(ok) > 0)
    // escape hatch
    withCap("spark.graft.planGuard.lambdaIndex.enabled", "false") {
      assert(touch(trap) > 0)
    }
    // indexing a MATERIALIZED (attribute) array inside a lambda is fine
    val mat = docs.select(col("doc_id"), split(col("text"), " ").as("t"))
      .localCheckpoint(true)
      .select(filter(sequence(lit(1), size(col("t"))), i =>
        length(element_at(col("t"), i.cast("int"))) > 1).as("hits"))
    assert(touch(mat) >= 0 && mat.count() === n)
  }

  test("outer join whose condition references only one side is cartesian-like") {
    // A LEFT JOIN B ON a.x > 0 constrains nothing about the pairing: each
    // qualifying A row matches EVERY B row. The inner-join variants of this
    // (ON 1=1, one-sided deterministic predicates) are simplified/pushed to
    // an empty condition before the guard's batch — the outer-join form is
    // the one that survives to the ON clause, because a preserved-side
    // predicate only controls matching and cannot be pushed below the join.
    withCap("spark.graft.planGuard.maxCartesianBytes", "1024") {
      val e = intercept[Throwable] {
        li.as("a").join(li.select("l_orderkey").as("b"),
          col("a.l_linenumber") > 0, "left").count()
      }
      assert(isGuard(e), s"expected PlanGuardViolation, got $e")
      // negative control UNDER THE SAME LOWERED CAP: a genuinely two-sided
      // equality join of the same big-both-sides shape must pass — outside
      // the cap block this would be vacuous (nothing trips a multi-GB cap
      // at sf0.01 regardless of what isCartesianLike returns)
      val n = li.as("a").join(li.select(col("l_orderkey").as("k")).as("b"),
        col("a.l_orderkey") === col("b.k")).count()
      assert(n > 0)
    }
  }
}
