package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle enumeration — the fourth member of the graph
  * family next to PageRank (fixed point), connected components (pointer
  * doubling) and BFS (frontier expansion). Triangle density is the
  * classic graph-quality / community-structure signal (clustering
  * coefficient, spam-farm detection in link graphs).
  *
  * Algorithm: degree-ordered compact-forward (Suri & Vassilvitskii,
  * WWW'11 "Counting triangles and the curse of the last reducer";
  * Latapy 2008). Every undirected edge is oriented from its lower
  * endpoint to its higher in the (degree, id) total order; wedges are
  * built only from each node's OUT-neighbors and closed against the
  * oriented edge list. The orientation is the whole scale story: a
  * node's out-degree under degree ordering is O(sqrt(m)) regardless of
  * its true degree, so the wedge stream — the quadratic hazard a hub
  * node creates in a naive neighbor join — is bounded by sum of
  * out-deg^2 <= O(m^1.5), and the "last reducer" holding a celebrity
  * node never materializes its full neighborhood square.
  *
  * Plan shape: one aggregate for degrees, one join to attach them, a
  * self-join on the wedge apex, and one closing join — all
  * shuffle-partitioned on node / edge keys, no broadcast of anything
  * graph-sized.
  *
  * Input: (src, dst) edge list, any orientation/duplication (the
  * operator canonicalizes + dedupes; self-loops dropped). Output: one
  * row per triangle, endpoints sorted ascending by id: (a, b, c).
  */
object Triangles {

  def triangles(edges0: DataFrame): DataFrame = {
    val src = edges0.columns(0)
    val dst = edges0.columns(1)
    // canonical undirected edge (lo, hi) by node id, deduped — persisted:
    // THREE downstream scans (both arms of the degree union plus the
    // degree-attach join) would each re-evaluate the caller's edge plan,
    // and fixture-style edge expressions (windows, joins) are exactly
    // what must not run four times (measured 6.6s -> 3.8s at the 100x
    // ScaleCheck corpus from this pin alone)
    val und = edges0
      .select(least(col(src), col(dst)).as("lo"),
        greatest(col(src), col(dst)).as("hi"))
      .where(col("lo") =!= col("hi"))
      .dropDuplicates("lo", "hi")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deg = und.select(col("lo").as("n"))
      .unionAll(und.select(col("hi").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
    // orient each edge from the (degree, id)-smaller endpoint to the
    // larger; carry the head's (d, id) so the closing join below can
    // re-orient wedge ends without another degree lookup
    val withDeg = und
      .join(deg.select(col("n").as("lo"), col("d").as("dlo")), "lo")
      .join(deg.select(col("n").as("hi"), col("d").as("dhi")), "hi")
    val oriented = withDeg.select(
      when(col("dlo") < col("dhi") ||
        (col("dlo") === col("dhi") && col("lo") < col("hi")),
        struct(col("lo").as("u"), col("hi").as("v"), col("dhi").as("dv")))
        .otherwise(
          struct(col("hi").as("u"), col("lo").as("v"), col("dlo").as("dv")))
        .as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"), col("e.dv").as("dv"))
      // two consumers below (wedge self-join sides + closing side) — the
      // alias-renamed-subtree lesson: pin it once
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // wedges from a shared apex u: out-neighbors (x, y); orient the
    // closing candidate (x, y) by the SAME (degree, id) order so it can
    // equi-join the oriented edge list
    val e1 = oriented.select(col("u"), col("v").as("x"), col("dv").as("dx"))
    val e2 = oriented.select(col("u"), col("v").as("y"), col("dv").as("dy"))
    val wedges = e1.join(e2, Seq("u"))
      .where(col("x") < col("y"))
      .select(col("u"),
        when(col("dx") < col("dy") ||
          (col("dx") === col("dy") && col("x") < col("y")),
          struct(col("x").as("cu"), col("y").as("cv")))
          .otherwise(struct(col("y").as("cu"), col("x").as("cv"))).as("c"))
      .select(col("u"), col("c.cu").as("cu"), col("c.cv").as("cv"))
    val closed = wedges.join(
      oriented.select(col("u").as("cu"), col("v").as("cv")), Seq("cu", "cv"))
    val out = closed
      .select(sort_array(array(col("u"), col("cu"), col("cv"))).as("t"))
      .select(col("t")(0).as("a"), col("t")(1).as("b"), col("t")(2).as("c"))
      .localCheckpoint(true)
    oriented.unpersist(blocking = false)
    und.unpersist(blocking = false)
    out
  }

  /** The wedge count — sum over apexes of C(out-degree, 2) under the same
    * (degree, id) orientation triangles() uses: the size of the operator's
    * self-join stream, i.e. the quantity its scale curve rides on
    * (bounded by O(m^1.5) via the orientation). Published by ScaleCheck
    * as the x_triangles row's growth-term cell.
    */
  private[graft] def wedgeCount(edges0: DataFrame): Long = {
    val src = edges0.columns(0)
    val dst = edges0.columns(1)
    val und = edges0
      .select(least(col(src), col(dst)).as("lo"),
        greatest(col(src), col(dst)).as("hi"))
      .where(col("lo") =!= col("hi"))
      .dropDuplicates("lo", "hi")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deg = und.select(col("lo").as("n"))
      .unionAll(und.select(col("hi").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
    val n = und
      .join(deg.select(col("n").as("lo"), col("d").as("dlo")), "lo")
      .join(deg.select(col("n").as("hi"), col("d").as("dhi")), "hi")
      .select(when(col("dlo") < col("dhi") ||
        (col("dlo") === col("dhi") && col("lo") < col("hi")),
        col("lo")).otherwise(col("hi")).as("u"))
      .groupBy("u").agg(count(lit(1)).as("d"))
      .agg(coalesce(sum(expr("d * (d - 1) div 2")), lit(0L)))
      .first().getLong(0)
    und.unpersist(blocking = false)
    n
  }
}
