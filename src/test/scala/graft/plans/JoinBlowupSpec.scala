package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Runtime join-blowup guard (PlanGuard's check-4 twin): detection logic
  * on real executed plans, listener wiring through the session, and the
  * measured per-query overhead the adoption decision rests on.
  */
class JoinBlowupSpec extends SparkSpec {

  private def execute(df: org.apache.spark.sql.DataFrame) = {
    df.collect()
    df.queryExecution.executedPlan
  }

  test("a hot-key join blowup is detected from the executed plan's metrics") {
    import spark.implicits._
    // 2000 rows all sharing ONE key: the self-join outputs 4M rows from
    // 2000-row inputs — the exact shape of a bucket that outgrew its cap
    val hot = spark.range(2000).select(lit(0L).as("k"), col("id"))
    val joined = hot.as("a").join(hot.as("b"), "k")
    val plan = execute(joined.select(count(lit(1))))
    val findings = JoinBlowupListener.inspect(plan, factor = 32, minRows = 100000)
    assert(findings.nonEmpty, "4M-from-2k join must be flagged")
    assert(findings.head.outputRows === 4000000L)
    assert(findings.head.maxInputRows <= 2000L)
  }

  test("an explode-driven generator blowup is detected; shingle-scale explodes are not") {
    // the identity-collapse failure mode: a generator that emits C(g,2)
    // pairs per group row — here 200 rows each exploding into 100k
    // elements = 20M rows at a 100000x per-row ratio, far past genFactor
    val blown = spark.range(200)
      .select(explode(sequence(lit(0), lit(99999))).as("v"))
    val plan = execute(blown.select(count(lit(1))))
    val findings = JoinBlowupListener.inspect(plan, 32, 10000000,
      genFactor = 4096, genMinRows = 1000000)
    assert(findings.nonEmpty, "20M-from-200 explode must be flagged")
    assert(findings.head.kind === "generator")
    assert(findings.head.outputRows === 20000000L)
    // a legitimate corpus-shaped explode (hundreds of grams per doc) sits
    // orders of magnitude under genFactor and is NOT flagged even with the
    // row floor forced to 1
    val grams = spark.range(5000)
      .select(explode(sequence(lit(0), lit(499))).as("g"))
    val gplan = execute(grams.select(count(lit(1))))
    assert(JoinBlowupListener.inspect(gplan, 32, 10000000,
      genFactor = 4096, genMinRows = 1).isEmpty,
      "a 500x-per-doc shingle explode must stay under the generator threshold")
  }

  test("a union feeding a join contributes EVERY branch to the input estimate") {
    // regression: inputRows used to collectFirst the first measuring
    // child — a union's input was one branch's count, understating the
    // denominator and manufacturing false blowups. 40k-row union joined
    // to itself on a unique key outputs 40k rows: ratio 1, never a blowup.
    val half = spark.range(20000).select(col("id").as("k"))
    val both = half.unionByName(
      spark.range(20000, 40000).select(col("id").as("k")))
    val plan = execute(both.as("a").join(both.as("b"), "k").select(count(lit(1))))
    // factor=1 is the discriminating setting: the true ratio is exactly 1
    // (40000 > 1*40000 is false), while the old one-branch estimate read
    // 40000 > 1*20000 and flagged a phantom blowup
    assert(JoinBlowupListener.inspect(plan, factor = 1, minRows = 1).isEmpty,
      "unique-key self-join over a union must read ratio ~1, not 2x")
  }

  test("legitimate joins are not flagged at production thresholds") {
    val orders = graft.Tables(spark, sf001, "orders")
    val cust = graft.Tables(spark, sf001, "customer")
    val plan = execute(
      orders.join(cust, orders("o_custkey") === cust("c_custkey"))
        .groupBy("c_mktsegment").count())
    assert(JoinBlowupListener.inspect(plan, 32, 10000000).isEmpty)
    // and even at a floor of 1 row the FK join's ratio stays ~1
    assert(JoinBlowupListener.inspect(plan, 32, 1).isEmpty)
  }

  test("the session listener records findings into the registry") {
    import org.scalatest.concurrent.Eventually._
    import org.scalatest.time.SpanSugar._
    JoinBlowupListener.clear()
    spark.conf.set("spark.graft.runtimeGuard.minRows", "100000")
    try {
      val hot = spark.range(1000).select(lit(0L).as("k"), col("id"))
      hot.as("a").join(hot.as("b"), "k").select(count(lit(1))).collect()
      // QueryExecutionListeners fire on the async listener bus
      eventually(timeout(10.seconds)) {
        assert(JoinBlowupListener.recent().nonEmpty)
      }
      intercept[PlanGuardViolation] { JoinBlowupListener.assertClean() }
    } finally {
      spark.conf.unset("spark.graft.runtimeGuard.minRows")
      JoinBlowupListener.clear()
    }
    JoinBlowupListener.assertClean() // clean registry passes
  }

  test("overhead: one inspection costs well under a millisecond") {
    val orders = graft.Tables(spark, sf001, "orders")
    val cust = graft.Tables(spark, sf001, "customer")
    val plan = execute(
      orders.join(cust, orders("o_custkey") === cust("c_custkey"))
        .groupBy("c_mktsegment").count())
    // warm
    (1 to 10).foreach(_ => JoinBlowupListener.inspect(plan, 32, 10000000))
    val t0 = System.nanoTime()
    val n = 1000
    (1 to n).foreach(_ => JoinBlowupListener.inspect(plan, 32, 10000000))
    val perCallMs = (System.nanoTime() - t0) / 1e6 / n
    info(f"inspect() cost: $perCallMs%.4f ms per query")
    assert(perCallMs < 1.0, f"plan-walk overhead $perCallMs%.4f ms is too high")
  }
}
