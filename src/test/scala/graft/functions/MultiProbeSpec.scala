package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._

/** The multi-probe LSH kernel (VectorOps.hyperplaneProbes — Lv et al.
  * VLDB'07) and its lshTopK integration. The contract that matters at
  * scale: (T tables, P probes) recall ≈ (T*P tables, 1 probe) recall while
  * the corpus side pays only T tables of hashing/explode — so the kernel's
  * probe ORDER (cheapest margin perturbations first) is the whole value.
  */
class MultiProbeSpec extends SparkSpec {

  import spark.implicits._

  private def arr(xs: Double*): GenericArrayData = new GenericArrayData(xs.toArray)

  test("probe layout: base signature first per table, probes distinct, deterministic") {
    val v = arr(0.3, -1.2, 2.1, 0.05, -0.4, 0.9, 1.5, -0.7)
    val planes = 10; val tables = 3; val probes = 6
    val out = VectorOps.hyperplaneProbes(v, planes, tables, probes).toLongArray()
    assert(out.length == tables * probes)
    val sigs = VectorOps.hyperplaneSigs(v, planes, tables).toLongArray()
    for (t <- 0 until tables) {
      val mine = out.slice(t * probes, (t + 1) * probes)
      assert(mine(0) == sigs(t), s"table $t: probe 0 must be the base signature")
      assert(mine.distinct.length == probes, s"table $t: duplicate probes")
      // every probe stays in the plane-bucket space
      assert(mine.forall(b => b >= 0 && b < (1L << planes)))
    }
    val again = VectorOps.hyperplaneProbes(v, planes, tables, probes).toLongArray()
    assert(out.sameElements(again))
  }

  test("probes flip the lowest-margin planes first (cheapest-first enumeration)") {
    // margins are explicit: weight signs come from XXH64, so recover the
    // projection per plane by brute force and check the first perturbation
    // flips exactly the min-|projection| plane
    val v = arr(1.0, 2.0, -3.0, 0.5, 4.0, -1.5, 2.5, 0.25)
    val planes = 12
    val out = VectorOps.hyperplaneProbes(v, planes, 1, 4).toLongArray()
    val sig = out(0)
    // projections, replicated from the kernel's weight scheme (table 0)
    val proj = (0 until planes).map { p =>
      (0 until 8).map { d =>
        val w = if ((org.apache.spark.sql.catalyst.expressions.XXH64
          .hashLong(p.toLong * 65536 + d, 0L) & 8L) == 8L) 1.0 else -1.0
        v.getDouble(d) * w
      }.sum
    }
    val byMargin = (0 until planes).sortBy(p => math.abs(proj(p)))
    // probe 1 = flip the single cheapest plane
    assert(out(1) == (sig ^ (1L << byMargin.head)))
    // probe 2 is either the second-cheapest single flip or the cheapest
    // pair {0,1} — whichever costs less (shift/expand successor rule)
    val costSingle2 = math.abs(proj(byMargin(1)))
    val costPair01 = math.abs(proj(byMargin(0))) + math.abs(proj(byMargin(1)))
    val expected2 =
      if (costSingle2 <= costPair01) sig ^ (1L << byMargin(1))
      else sig ^ (1L << byMargin(0)) ^ (1L << byMargin(1))
    assert(out(2) == expected2)
  }

  test("nProbes=1 probe set equals hyperplaneSigs (lshTopK default unchanged)") {
    val v = arr(0.9, -0.2, 1.4, -2.2, 0.6, 0.1, -1.1, 3.0)
    val p1 = VectorOps.hyperplaneProbes(v, 8, 8, 1).toLongArray()
    val sigs = VectorOps.hyperplaneSigs(v, 8, 8).toLongArray()
    assert(p1.sameElements(sigs))
  }

  test("nProbes beyond the perturbation space pads with the base signature") {
    val v = arr(1.0, -1.0, 0.5, 2.0)
    // 2 planes -> 3 possible perturbations; ask for 8 probes
    val out = VectorOps.hyperplaneProbes(v, 2, 1, 8).toLongArray()
    assert(out.length == 8)
    assert(out.take(4).distinct.length == 4) // base + all 3 perturbations
    assert(out.drop(4).forall(_ == out(0))) // padded tail
  }

  test("multi-probe recall matches a many-table schedule at a fraction of corpus work") {
    GraftFunctions.register(spark)
    val emb = graft.Tables(spark, sf001, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    // 20 perturbed copies, the same cosine-0.97 probe population the
    // x_ann_* oracles use
    val queries = emb.where(col("vec_id") < 20)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          x * (lit(1.0) + lit(0.25) * when(pmod(i, lit(2)) === 0, lit(1.0))
            .otherwise(lit(-1.0)))).as("embedding"))
    def recovered(tables: Int, probes: Int): Long =
      graft.operators.Similarity.lshTopK(emb, queries, "vec_id", "embedding",
        k = 10, numPlanes = 8, numTables = tables, nProbes = probes)
        .where(col("vid") === col("qid") - 1000000L).count()
    // (2 tables, 4 probes) must reach the recall contract the board's
    // 8-table single-probe schedule is calibrated to — with 4x less
    // corpus-side hashing and explode
    val multi = recovered(tables = 2, probes = 4)
    assert(multi >= 18, s"multi-probe recovered only $multi/20")
    // and strictly beat what its own 2 tables buy without probing
    val plain2 = recovered(tables = 2, probes = 1)
    assert(multi > plain2,
      s"probing added nothing: $multi vs $plain2 on 2 tables")
  }
}
