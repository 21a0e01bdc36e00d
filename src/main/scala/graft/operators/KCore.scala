package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition — the fifth graph-family member next to PageRank
  * (fixed point), connected components (pointer doubling), BFS (frontier
  * expansion) and triangles (degree-ordered enumeration): the maximal
  * subgraph in which every node has degree >= k. The density/quality
  * filter for link and interaction graphs — "drop everything that is not
  * embedded in at least k relationships" survives spam tendrils and
  * scraping artifacts that raw degree thresholds miss, because peeling
  * CASCADES: removing a weak node can expose its neighbors.
  *
  * Algorithm: synchronous iterative peeling. Each round computes degrees
  * (one aggregate over the live edge list), drops nodes under k, and
  * semi-joins the edge list down to survivors — all shuffle-partitioned
  * on node/edge keys, nothing graph-sized on the driver. Rounds are
  * bounded by the graph's peeling DEPTH (the longest remove-expose
  * chain), not its size: per round every currently-under-k node leaves
  * simultaneously. Lineage is capped per round with an eager
  * localCheckpoint (the PageRank/BFS discipline; use a reliable
  * checkpoint cadence for peeling depths beyond tens of rounds).
  *
  * Input: (src, dst) edge list in any orientation/duplication — the
  * operator canonicalizes + dedupes and drops self-loops, so degree
  * means "distinct neighbors". Returns the surviving nodes as one `id`
  * column. Throws if maxIter rounds pass without reaching the fixpoint —
  * a truncated peel would silently return a SUPERSET of the k-core.
  */
object KCore {

  def kcore(edges0: DataFrame, k: Int, maxIter: Int = 50): DataFrame = {
    require(k >= 1, s"k ($k) must be >= 1")
    val src = edges0.columns(0)
    val dst = edges0.columns(1)
    var edges = edges0
      .select(least(col(src), col(dst)).as("lo"),
        greatest(col(src), col(dst)).as("hi"))
      .where(col("lo") =!= col("hi"))
      .dropDuplicates("lo", "hi")
      .localCheckpoint(true)
    var prev = -1L
    var iter = 0
    while (iter < maxIter) {
      val deg = edges.select(col("lo").as("id"))
        .unionAll(edges.select(col("hi").as("id")))
        .groupBy("id").agg(count(lit(1)).as("d"))
      val alive = deg.where(col("d") >= k).select("id")
        .localCheckpoint(true)
      val n = alive.count()
      if (n == prev) return alive // fixpoint: nobody dropped this round
      prev = n
      edges = edges
        .join(alive.withColumnRenamed("id", "lo"), Seq("lo"), "left_semi")
        .join(alive.withColumnRenamed("id", "hi"), Seq("hi"), "left_semi")
        .select("lo", "hi")
        .localCheckpoint(true)
      iter += 1
    }
    throw new IllegalStateException(
      s"k-core did not converge in $maxIter rounds - a truncated peel " +
        "returns a superset of the core; raise maxIter")
  }
}
