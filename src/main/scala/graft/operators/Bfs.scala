package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-source BFS over an (src, dst) edge frame: the distance from every
  * reachable node to its NEAREST seed — the frontier-expansion member of
  * the iterative-dataflow family (PageRank is fixed-point iteration,
  * connected components is pointer doubling; BFS is monotone frontier
  * growth). The workhorse behind label propagation, influence radius, and
  * "hops from a trusted set" curation filters.
  *
  * Per sweep: frontier ⋈ edges on src -> neighbor candidates at dist+1,
  * anti-joined against the visited set (a node's FIRST discovery is its
  * BFS distance — later discoveries are never shorter), new frontier
  * unioned into visited. Loop ends when the frontier empties or maxIter
  * sweeps have run (the per-sweep emptiness test is one driver-side count
  * of an already-materialized frame).
  *
  * Scale shape: edges are hash-partitioned ONCE on src before the loop,
  * so every sweep's join co-locates against the (frontier-sized) probe
  * without re-exchanging the big operand; visited/frontier are node-sized
  * (id, dist) frames localCheckpoint'd per sweep to cap lineage. Nodes
  * unreachable within maxIter are ABSENT from the result (callers join
  * back to their node universe if they need explicit infinities).
  *
  * Directed semantics: distances follow edge direction; pass both
  * orientations for an undirected graph.
  */
object Bfs {

  /** (id, dist) for every node reachable from `seeds` in <= maxIter hops.
    * Durability mirrors PageRank: with a reliable checkpoint dir
    * configured, frontier frames checkpoint to it (a lost executor
    * replays nothing — every sweep's output is durable); without one
    * they localCheckpoint (executor-pinned blocks, lost-executor
    * restarts the traversal). At the 100 TB design point, set the dir.
    */
  def multiSourceDistance(edges: DataFrame, seeds: DataFrame,
      maxIter: Int = 30): DataFrame = {
    require(maxIter >= 0, "maxIter must be >= 0")
    val reliable = edges.sparkSession.sparkContext.getCheckpointDir.isDefined
    def pin(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint(true) else df.localCheckpoint(true)
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .repartition(col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val seeds0 = pin(seeds.select(col("id").cast("long"), lit(0).as("dist"))
        .distinct())
      // visited = lazy union of the per-sweep CHECKPOINTED frontiers: the
      // anti-join has to scan the visited set each sweep anyway, but this
      // shape never REWRITES it — a visited.localCheckpoint per sweep
      // would materialize O(n) rows k times for a k-sweep run. The union
      // tree stays <= maxIter checkpointed leaves deep.
      var frames = List(seeds0)
      var frontier = seeds0
      var it = 0
      while (it < maxIter && !frontier.isEmpty) {
        it += 1
        val visited = frames.reduce(_ unionByName _)
        val next = frontier.withColumnRenamed("id", "src")
          .join(e, "src")
          .select(col("dst").as("id"), (col("dist") + 1).as("dist"))
          .groupBy("id").agg(min("dist").as("dist")) // dedup within the sweep
          .join(visited.select("id"), Seq("id"), "left_anti")
        val pinned = pin(next)
        frames ::= pinned
        frontier = pinned
      }
      frames.reduce(_ unionByName _)
    } finally e.unpersist()
  }
}
