package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  import spark.implicits._

  test("saltedJoin == plain join result on skewed data") {
    // one hot key holding 80% of the left side
    val left = ((1 to 800).map(_ => (1, "hot")) ++ (1 to 200).map(i => (i % 50 + 2, "cold")))
      .toDF("k", "tag")
    val right = (1 to 60).map(i => (i, s"dim_$i")).toDF("k", "name")
    val plain = left.join(right, "k").groupBy("k").count()
    val salted = Skew.saltedJoin(left, right, "k", saltFactor = 8)
      .groupBy("k").count()
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("saltedCount == plain groupBy count") {
    val df = ((1 to 900).map(_ => "hot") ++ (1 to 100).map(i => s"k$i")).toDF("k")
    val plain = df.groupBy("k").agg(count(lit(1)).as("cnt"))
    val salted = Skew.saltedCount(df, "k", saltFactor = 8)
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }
}
