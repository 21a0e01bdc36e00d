package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-handling join utilities for the 100 TB path.
  *
  * AQE's skew-join split handles most cases at runtime
  * (spark.sql.adaptive.skewJoin.enabled, on by default); explicit salting
  * remains necessary when a single hot key exceeds what partition-splitting
  * can fix (e.g. a null-ish default key holding >10% of a fact table) or
  * when the skewed side feeds an aggregation rather than a join.
  */
object Skew {

  /** Salted inner equi-join: the skewed left side gets a random salt in
    * [0, saltFactor); the right side is replicated saltFactor times so every
    * (key, salt) pair finds its match. Join key cardinality rises by
    * saltFactor, splitting each hot key's rows across saltFactor reducers.
    *
    * Use when `left` is large and skewed on `key` and `right` is small
    * enough to replicate but too big to broadcast.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      saltFactor: Int): DataFrame = {
    val salted = left.withColumn("__salt",
      (rand(seed = 42) * saltFactor).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase (partial -> final) aggregation for skewed group keys:
    * pre-aggregate on (key, salt), then combine per key. Catalyst already
    * plans partial aggregation; the explicit salt helps when a single key's
    * partials still overflow one reducer (e.g. collect_list-style aggs
    * with no map-side reduction).
    */
  def saltedCount(df: DataFrame, key: String, saltFactor: Int): DataFrame =
    df.withColumn("__salt", (rand(seed = 42) * saltFactor).cast("int"))
      .groupBy(col(key), col("__salt")).agg(count(lit(1)).as("__partial"))
      .groupBy(col(key)).agg(sum("__partial").as("cnt"))
}
