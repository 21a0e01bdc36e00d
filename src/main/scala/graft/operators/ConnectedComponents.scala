package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed connected components over a pair list — the step that turns
  * near-duplicate PAIRS (minhash/simhash/embedding LSH output) into dedup
  * CLUSTERS, so "keep one document per duplicate group" is well-defined even
  * when duplicates chain (A~B, B~C but A!~C must still collapse to one
  * representative).
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) — each round is
  * two aggregate-shaped shuffles over the current edge set, edges contract
  * toward stars, and convergence is O(log^2 n) rounds worst-case (2-3 rounds
  * for the near-clique components LSH actually emits). Per-round state is
  * just the edge list: no per-component accumulation, no driver-side graph,
  * nothing keyed by component size — a billion-node dup graph runs the same
  * plan as a thousand-node one.
  *
  *  - large-star(u): m = min(N(u) + u); emit (v, m) for every neighbor
  *    v > u — big neighbors re-point at the local minimum.
  *  - small-star(u) on smaller-directed edges: m = min(N<(u) + u); emit
  *    (v, m) for every v in N<(u) + u — small neighbors collapse onto m.
  *
  * Round storage: each round is localCheckpoint'd — a round references the
  * previous edge set several times (sym is edges twice, then two joins over
  * it), so anything short of a hard lineage cut grows the plan
  * EXPONENTIALLY per round and stalls the optimizer within a handful of
  * rounds. Dataset.unpersist is a no-op on checkpointed data, so the
  * previous round's blocks are freed by unpersisting the underlying
  * checkpoint RDD (LogicalRDD) directly. Convergence is detected by
  * (count, xor-of-hashes) equality of the edge set — one aggregate job,
  * no except().
  */
object ConnectedComponents {

  /** pairs (c1, c2) -> (id, cluster) for every id appearing in pairs, where
    * cluster is the smallest id in the component.
    */
  def clusters(pairs: DataFrame, c1: String, c2: String,
      maxRounds: Int = 30): DataFrame = {
    def canon(e: DataFrame): DataFrame = orient(e).distinct()

    // Canonical direction. The large-star intermediate MUST stay deduped
    // (canon, not orient): on clique-shaped components — exactly what
    // minhash-LSH pair generation emits — every neighbor u of v produces
    // the same (v, min) row, so an undeduped large-star output carries
    // |E| ≈ n² rows per clique into the small-star join and the final
    // distinct, where ~n distinct rows suffice. A round-4 experiment
    // dropped this distinct on the strength of a 200k-node chain/near-
    // clique synthetic (warm-session 17.3s -> 10s); the driver-scale bench
    // falsified it: clique-heavy x_dedup_clusters regressed 4.0s -> 25.0s
    // while chain-shaped x_cluster_cc (same code, no duplicate pairs) was
    // flat — i.e. the dedup exchange costs ~nothing on chains at sf0.1 and
    // bounds the clique blow-up, so it stays. At 100 TB the asymmetry only
    // grows: a billion-node dup graph with large cliques would feed an
    // |E|-row exchange where an n-row one suffices.
    def orient(e: DataFrame): DataFrame = e
      .where(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))

    def fingerprint(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)),
        coalesce(expr("bit_xor(xxhash64(u, v))"), lit(0L))).first()
      (r.getLong(0), r.getLong(1))
    }

    // Integral ids only, checked up front: a silent cast-to-null (or a
    // truncating double cast) would DROP edges and quietly label every
    // affected doc its own representative — a dedup that dedups nothing.
    Seq(c1, c2).foreach { c =>
      pairs.schema(c).dataType match {
        case ByteType | ShortType | IntegerType | LongType => ()
        case other => throw new IllegalArgumentException(
          s"pair column '$c' must be integral, got ${other.catalogString}; " +
            "derive a long id first (hash or zipWithIndex)")
      }
    }
    // LAZY checkpoints throughout the loop: the fingerprint action right
    // after materializes the checkpoint blocks inside its own job, so each
    // round costs ONE job (agg + block writes) instead of two (eager
    // materialize, then agg over the cache). The lineage cut itself is
    // still load-bearing — see the scaladoc.
    var edges = canon(pairs.select(col(c1).cast("long").as("u"),
      col(c2).cast("long").as("v"))
      .where(col(c1).isNotNull && col(c2).isNotNull))
      .localCheckpoint(false)
    var fp = fingerprint(edges)
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxRounds) {
      // large-star over the symmetric view
      val sym = edges.unionByName(
        edges.select(col("v").as("u"), col("u").as("v")))
      val minN = sym.groupBy("u").agg(min("v").as("mv"))
        .select(col("u"), least(col("u"), col("mv")).as("m"))
      val ls = canon(sym.join(minN, "u")
        .where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v")))
      // small-star over smaller-directed edges (canon keeps u > v)
      val minS = ls.groupBy("u").agg(min("v").as("m"))
      val ss = canon(ls.join(minS, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .unionByName(minS.select(col("u"), col("m").as("v"))))
      val next = ss.localCheckpoint(false)
      val nfp = fingerprint(next) // materializes next's blocks in the same job
      converged = nfp == fp
      freeCheckpoint(edges) // Dataset.unpersist can't reach checkpoint blocks
      edges = next
      fp = nfp
      rounds += 1
    }
    require(converged, s"connected components did not converge in $maxRounds rounds")
    // fixpoint edges are (member -> root); roots label themselves.
    // Materialize the labels so the final round's blocks can be released
    // instead of squatting behind a lazy result for the rest of the session.
    val labels = edges.select(col("u").as("id"), col("v").as("cluster"))
      .unionByName(edges.select(col("v").as("id"), col("v").as("cluster")))
      .distinct()
      .localCheckpoint(true)
    freeCheckpoint(edges)
    labels
  }

  /** Release the storage behind a localCheckpoint'd frame: the blocks live
    * on the checkpoint RDD inside the LogicalRDD leaf, which
    * Dataset.unpersist (CacheManager-scoped) never sees.
    */
  private def freeCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectLeaves().foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(false)
      case _ => ()
    }

  /** Dedup by clustering: every id keeps its cluster representative (the
    * smallest id in its duplicate group); ids not in any pair are their own
    * representative. Returns (idCol, cluster, is_representative).
    */
  def representatives(ids: DataFrame, idCol: String, pairs: DataFrame,
      c1: String, c2: String): DataFrame = {
    // Same integral-id guard as clusters(): a string/double id column would
    // cast silently (null/truncation), mis-join the labels, and every
    // affected doc would quietly become its own representative.
    ids.schema(idCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case other => throw new IllegalArgumentException(
        s"id column '$idCol' must be integral, got ${other.catalogString}; " +
          "derive a long id first (hash or zipWithIndex)")
    }
    val labels = clusters(pairs, c1, c2)
    ids.select(col(idCol).cast("long").as("id"))
      .join(labels, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("cluster"), col("id")).as("cluster"))
      .withColumn("is_representative", col(idCol) === col("cluster"))
  }
}
