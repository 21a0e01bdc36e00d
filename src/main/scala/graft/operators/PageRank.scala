package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative PageRank over an (src, dst) edge frame — the classic
  * iterative-dataflow workload (Page et al. 1999; the canonical RDD-engine
  * example, re-expressed as DataFrame joins so Catalyst plans each
  * sweep).
  *
  * Per iteration: contribs = ranks ⋈ edges on src, each edge carries
  * rank/out-degree to its dst; new rank = (1-d)/N + d * sum(contribs).
  * Nodes with no in-edges keep the teleport term; DANGLING nodes (no
  * out-edges) simply drop their mass — the simple-PageRank convention,
  * documented rather than hidden (redistributing dangling mass adds a
  * per-iteration global aggregate; callers who need the stochastic-matrix
  * invariant can add a sink edge per dangling node).
  *
  * Scale shape: the edge table is the big operand and it is HASH-
  * PARTITIONED ONCE on src (repartition before the loop), so every
  * iteration's join co-locates with the (node-sized) rank table without
  * re-exchanging edges; the groupBy(dst) is the one shuffle per sweep,
  * linear in |E|. Each iteration's result is localCheckpoint'd: 10
  * iterations of join+agg otherwise stack into one plan whose analysis
  * time grows quadratically and whose lineage recomputes everything on a
  * lost partition.
  */
object PageRank {

  /** (id, rank) after `iterations` sweeps at damping `d`, initialized
    * uniform over the nodes present in `edges` (either endpoint).
    */
  def run(edges: DataFrame, iterations: Int = 10,
      damping: Double = 0.85): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    val spark = edges.sparkSession
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .repartition(col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val nodes = e.select(col("src").as("id"))
        .unionByName(e.select(col("dst").as("id")))
        .distinct()
        .localCheckpoint(true)
      val n = nodes.count()
      val outDeg = e.groupBy("src").agg(count(lit(1)).as("deg"))
      // edges annotated with out-degree once, outside the loop
      val withDeg = e.join(outDeg, "src")
        .select(col("src"), col("dst"), col("deg"))
        .localCheckpoint(true)
      val teleport = (1.0 - damping) / n
      var ranks = nodes.select(col("id"), lit(1.0 / n).as("rank"))
        .localCheckpoint(true)
      for (_ <- 1 to iterations) {
        val contribs = withDeg
          .join(ranks.withColumnRenamed("id", "src"), "src")
          .select(col("dst").as("id"), (col("rank") / col("deg")).as("c"))
          .groupBy("id").agg(sum("c").as("inflow"))
        ranks = nodes
          .join(contribs, Seq("id"), "left")
          .select(col("id"),
            (lit(teleport) + lit(damping) * coalesce(col("inflow"), lit(0.0)))
              .as("rank"))
          .localCheckpoint(true)
      }
      ranks
    } finally e.unpersist()
  }
}
