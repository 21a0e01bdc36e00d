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
  * Nodes with no in-edges keep the teleport term. DANGLING nodes (no
  * out-edges) have two modes:
  *   - default: their mass drops — the simple-PageRank convention, cheap
  *     (no extra aggregate) but sum(rank) decays below 1;
  *   - `redistributeDangling = true`: their mass is spread uniformly each
  *     sweep (the stochastic-matrix convention, Page et al. §2.6), at the
  *     cost of one tiny global aggregate per iteration — sum(rank) then
  *     stays 1 up to float error, which PageRankSpec pins.
  *
  * Scale shape: the edge table is the big operand and it is HASH-
  * PARTITIONED ONCE on src (repartition before the loop), so every
  * iteration's join co-locates with the (node-sized) rank table without
  * re-exchanging edges; the groupBy(dst) is the one shuffle per sweep,
  * linear in |E|.
  *
  * Durability: when the session has a RELIABLE checkpoint dir configured
  * (`sc.setCheckpointDir`), ranks are checkpointed to it every
  * `checkpointInterval` sweeps and lineage is allowed to accumulate (a
  * bounded `checkpointInterval`-deep plan) in between — a lost executor
  * replays at most `checkpointInterval` sweeps from durable storage.
  * Without a checkpoint dir the loop falls back to per-sweep
  * localCheckpoint, which caps lineage but pins blocks to executors: one
  * lost executor restarts the job. At the 100 TB design point, set the
  * checkpoint dir.
  *
  * Convergence: `tol > 0` adds an L1-delta test per sweep (one node-sized
  * join + aggregate) and stops as soon as sum|r_t - r_{t-1}| < tol;
  * `iterations` remains the hard cap.
  */
object PageRank {

  /** (id, rank) after at most `iterations` sweeps at damping `d`,
    * initialized uniform over the nodes present in `edges` (either
    * endpoint).
    */
  def run(edges: DataFrame, iterations: Int = 10,
      damping: Double = 0.85,
      redistributeDangling: Boolean = false,
      tol: Double = 0.0,
      checkpointInterval: Int = 5): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    require(checkpointInterval >= 1, "checkpointInterval must be >= 1")
    val spark = edges.sparkSession
    val reliable = spark.sparkContext.getCheckpointDir.isDefined
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
      // static dangling set: in the node universe, absent from outDeg
      val dangling =
        if (!redistributeDangling) null
        else nodes.join(outDeg.select(col("src").as("id")), Seq("id"), "left_anti")
          .localCheckpoint(true)
      val teleport = (1.0 - damping) / n
      var ranks = nodes.select(col("id"), lit(1.0 / n).as("rank"))
        .localCheckpoint(true)
      var it = 0
      var done = false
      while (it < iterations && !done) {
        it += 1
        // Uniform share of this sweep's dangling mass — a node-count-sized
        // semi-join + scalar aggregate, the documented price of the
        // stochastic-matrix invariant.
        val dShare =
          if (!redistributeDangling) 0.0
          else {
            val dm = ranks.join(dangling, Seq("id"), "left_semi")
              .agg(coalesce(sum("rank"), lit(0.0))).first().getDouble(0)
            damping * dm / n
          }
        val contribs = withDeg
          .join(ranks.withColumnRenamed("id", "src"), "src")
          .select(col("dst").as("id"), (col("rank") / col("deg")).as("c"))
          .groupBy("id").agg(sum("c").as("inflow"))
        val next = nodes
          .join(contribs, Seq("id"), "left")
          .select(col("id"),
            (lit(teleport + dShare) +
              lit(damping) * coalesce(col("inflow"), lit(0.0))).as("rank"))
        var saved =
          if (reliable) {
            if (it % checkpointInterval == 0 || it == iterations) next.checkpoint(true)
            else next // bounded lineage: at most checkpointInterval sweeps deep
          } else next.localCheckpoint(true)
        if (tol > 0.0) {
          val delta = saved.withColumnRenamed("rank", "r1")
            .join(ranks.withColumnRenamed("rank", "r0"), "id")
            .agg(coalesce(sum(abs(col("r1") - col("r0"))), lit(0.0)))
            .first().getDouble(0)
          if (delta < tol) {
            done = true
            // early exit between reliable checkpoints: pin the result so
            // it survives the edge unpersist below
            if (reliable && it % checkpointInterval != 0 && it != iterations)
              saved = saved.checkpoint(true)
          }
        }
        ranks = saved
      }
      ranks
    } finally e.unpersist()
  }
}
