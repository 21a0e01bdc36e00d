package graft

import graft.operators.LeakageSplit
import org.apache.spark.sql.functions._

class LeakageSplitSpec extends SparkSpec {
  import spark.implicits._

  private val defaultSplits =
    Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  test("threshold arithmetic: cumulative weights as padded lowercase hex") {
    // 0.8 * 16^4 = 52428.8 -> 0xcccc; 0.9 * 16^4 = 58982.4 -> 0xe666
    assert(LeakageSplit.thresholds(Seq(0.8, 0.1, 0.1), 4) ===
      Seq("cccc", "e666"))
    assert(LeakageSplit.thresholds(Seq(0.5, 0.5), 1) === Seq("8"))
    // weights normalize: (8, 1, 1) is the same banding as (0.8/0.1/0.1)
    assert(LeakageSplit.thresholds(Seq(8, 1, 1), 4) === Seq("cccc", "e666"))
  }

  test("atomicity: no cluster straddles splits, on a random pair graph") {
    val rng = new scala.util.Random(7)
    val items = (0L until 600L).toDF("id")
    val pairs = Seq.fill(400)((rng.nextInt(600).toLong,
      rng.nextInt(600).toLong)).filter(p => p._1 != p._2).toDF("a", "b")
    val out = LeakageSplit.assign(items, "id", pairs, "a", "b",
      defaultSplits, salt = "s")
    assert(out.count() === 600L) // one row per item, singletons included
    val straddlers = out.groupBy("cluster")
      .agg(countDistinct("split").as("k")).where(col("k") > 1).count()
    assert(straddlers === 0L)
    // every pair's endpoints agree on the split — the leakage contract
    // stated directly, independent of the cluster labels
    val disagree = pairs
      .join(out.select(col("id").as("a"), col("split").as("sa")), "a")
      .join(out.select(col("id").as("b"), col("split").as("sb")), "b")
      .where(col("sa") =!= col("sb")).count()
    assert(disagree === 0L)
  }

  test("proportions track weights on singletons; salt re-rolls them") {
    val items = (0L until 4000L).toDF("id")
    val noPairs = Seq.empty[(Long, Long)].toDF("a", "b")
    val out = LeakageSplit.assign(items, "id", noPairs, "a", "b",
      defaultSplits, salt = "roll1").cache()
    val frac = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1) / 4000.0).toMap
    // 6-sigma bounds: sd(train) = sqrt(.8*.2/4000) ~ 0.0063
    assert(frac("train") > 0.76 && frac("train") < 0.84, frac)
    assert(frac("val") > 0.07 && frac("val") < 0.13, frac)
    assert(frac("test") > 0.07 && frac("test") < 0.13, frac)
    // determinism: the same salt reproduces the identical assignment
    val again = LeakageSplit.assign(items, "id", noPairs, "a", "b",
      defaultSplits, salt = "roll1")
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
    // a different salt moves a weight-proportional share of items
    val rerolled = LeakageSplit.assign(items, "id", noPairs, "a", "b",
      defaultSplits, salt = "roll2")
    val moved = out.select(col("id"), col("split").as("s1"))
      .join(rerolled.select(col("id"), col("split").as("s2")), "id")
      .where(col("s1") =!= col("s2")).count()
    assert(moved > 0L, "salt change must re-roll some assignments")
    out.unpersist()
    ()
  }

  test("invalid configurations are refused") {
    val items = (0L until 4L).toDF("id")
    val noPairs = Seq.empty[(Long, Long)].toDF("a", "b")
    intercept[IllegalArgumentException] {
      LeakageSplit.assign(items, "id", noPairs, "a", "b",
        Seq("only" -> 1.0))
    }
    intercept[IllegalArgumentException] {
      LeakageSplit.assign(items, "id", noPairs, "a", "b",
        Seq("a" -> 0.5, "b" -> -0.1))
    }
    intercept[IllegalArgumentException] {
      LeakageSplit.assign(items, "id", noPairs, "a", "b",
        Seq("dup" -> 0.5, "dup" -> 0.5))
    }
    intercept[IllegalArgumentException] {
      LeakageSplit.assign(items, "id", noPairs, "a", "b",
        defaultSplits, hexChars = 16)
    }
  }
}
