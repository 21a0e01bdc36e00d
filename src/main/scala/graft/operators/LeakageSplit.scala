package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Leakage-safe train/val/test split — the assignment step every
  * dedup-aware training pipeline runs after near-dup clustering: if two
  * documents are near-duplicates, they must land in the SAME split, or
  * the held-out set silently contains paraphrases of training rows and
  * eval numbers inflate. The unit of assignment is therefore the
  * connected component of the near-dup pair graph, never the document.
  *
  * Mechanics: pairs -> [[ConnectedComponents.clusters]] (large-star/
  * small-star, the audited iterative op) -> one deterministic uniform
  * draw PER CLUSTER -> weight-proportional bucketing. The draw is the
  * first `hexChars` hex chars of md5(salt || cluster-id-as-string),
  * compared against hex thresholds precomputed from the cumulative split
  * weights — pure string comparison on lowercase hex, chosen over a
  * float in [0,1) because every SQL engine computes the identical md5 of
  * the identical bytes, which makes the whole assignment row-level
  * oracle-able (and re-runnable anywhere) with zero float-boundary risk.
  * Items that appear in no pair are their own singleton cluster (the
  * overwhelmingly common case, so proportions track weights closely; the
  * clustered minority moves in group-sized atoms, which is the point).
  *
  * Scale shape: the only iterative exchange is CC itself (already
  * stage-audited at 100x — SCALECHECK x_cluster_cc); the assignment adds
  * one broadcast-free projection and a left join of items against the
  * (much smaller) clustered-id set. Changing `salt` re-rolls the whole
  * assignment (new shuffling of clusters to splits) without touching the
  * clustering.
  *
  * Reference framing: the reference engine ships random_split
  * (/root/reference/src/rdd/rdd.rs — row-level Bernoulli); this is the
  * group-atomic counterpart a contamination-aware pipeline needs.
  */
object LeakageSplit {

  /** Hex comparison thresholds for the first size-1 splits: threshold i is
    * floor(cum_i / total * 16^hexChars) as zero-padded lowercase hex, so
    * `key < threshold(i)` carves [0, cum_1), [cum_1, cum_2), ... out of
    * the uniform hex key. Exposed for the spec to pin the arithmetic.
    */
  private[graft] def thresholds(weights: Seq[Double],
      hexChars: Int): Seq[String] = {
    val total = weights.sum
    val buckets = math.pow(16.0, hexChars)
    weights.init.scanLeft(0.0)(_ + _).tail.map { cum =>
      val t = math.floor(cum / total * buckets).toLong
      ("%0" + hexChars + "x").format(t)
    }
  }

  /** Assign every item to a split, atomically by near-dup cluster.
    *
    * @param items  frame holding one row per assignable item
    * @param idCol  item id column (long-compatible)
    * @param pairs  near-dup pair list (ids in `aCol`/`bCol`); any id not
    *               appearing here becomes its own singleton cluster
    * @param splits (name, weight) in band order; weights need not sum to 1
    * @param salt   prepended to the cluster id before hashing — re-rolls
    *               the assignment deterministically
    * @param hexChars resolution of the draw (16^hexChars buckets): weight
    *               bands narrower than 16^-hexChars round to empty
    * @return (id, cluster, split) — one row per item
    */
  def assign(items: DataFrame, idCol: String,
      pairs: DataFrame, aCol: String, bCol: String,
      splits: Seq[(String, Double)] =
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
      salt: String = "",
      hexChars: Int = 4): DataFrame = {
    require(splits.size >= 2, s"need at least 2 splits, got ${splits.size}")
    require(splits.forall(_._2 > 0), s"split weights must be positive: $splits")
    require(splits.map(_._1).distinct.size == splits.size,
      s"split names must be distinct: ${splits.map(_._1)}")
    require(hexChars >= 1 && hexChars <= 15,
      s"hexChars ($hexChars) must be in [1, 15] (15 keeps the threshold " +
        "arithmetic exact in a double)")
    assignWithLabels(items, idCol,
      ConnectedComponents.clusters(pairs, aCol, bCol), splits, salt, hexChars)
  }

  /** The assignment stage alone, given precomputed cluster labels —
    * [[assign]] minus the CC iteration. Factored out so ScaleCheck can
    * time the md5-bucketing + items-vs-clustered left join separately
    * from the (already stage-audited) CC core.
    */
  private[graft] def assignWithLabels(items: DataFrame, idCol: String,
      labels: DataFrame, splits: Seq[(String, Double)],
      salt: String, hexChars: Int): DataFrame = {
    val withCluster = items.select(col(idCol).as("id"))
      .join(labels, Seq("id"), "left")
      .select(col("id"), coalesce(col("cluster"), col("id")).as("cluster"))
    val key = substring(
      md5(concat(lit(salt), col("cluster").cast("string")).cast("binary")),
      1, hexChars)
    val thr = thresholds(splits.map(_._2), hexChars)
    val expr = splits.init.zip(thr).reverse
      .foldLeft(lit(splits.last._1): Column) {
        case (acc, ((name, _), t)) => when(key < lit(t), lit(name)).otherwise(acc)
      }
    withCluster.select(col("id"), col("cluster"), expr.as("split"))
  }
}
