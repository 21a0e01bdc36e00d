package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev diagnostics main (not part of the driver contract): decompose
  * x_semdedup's cost at a given corpus — fit / top-2 assignment /
  * occupancy profile / full operator — the KnnDiag discipline for the
  * semantic-dedup path. This is the harness that located the r8 cost
  * axes: the triple evaluation of the unpersisted assignment, the
  * 19.5M-pair ids-only verify join, and the per-row centroid-literal
  * conversion (each fixed in Dedup.semanticNearDup / VectorOps).
  * Usage: runMain graft.SemDiag [sfDir]
  */
object SemDiag {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    import graft.functions.GraftFunctions.graft_nearest2_centroids
    import graft.operators.{Dedup, Similarity}

    def t[A](what: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"SEMDIAG $what ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    // Mirror the query's par() spread: the scaled corpora are many small
    // files that FileSourceScan packs into 1-2 splits (51 MB at 100x vs
    // the 128 MB maxPartitionBytes) — without this repartition every
    // downstream narrow stage runs on 2 threads and the diag misattributes
    // ~8x of schedule loss to the assign kernel.
    val emb = Tables(spark, dir, "embeddings")
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val injected = emb.where(col("vec_id") < 20)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          x * (lit(1.0) + lit(0.10) * when(pmod(i, lit(2)) === 0, lit(1.0))
            .otherwise(lit(-1.0)))).as("embedding"))
    val df = emb.unionByName(injected)
    val vecs = df.select(col("vec_id").cast("long").as("vid"),
      col("embedding").as("cv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = t("count")(vecs.count())
    val nlist = math.max(16L, math.min(4096L, n / 48)).toInt
    println(s"SEMDIAG n=$n nlist=$nlist")
    val fitSet =
      if (n <= 20000) vecs
      else vecs.where(pmod(xxhash64(col("vid")), lit((n + 19999) / 20000)) === 0)
    val centroids = t("fit")(Similarity.fitCoarseCentroids(
      fitSet, "vid", "cv", nlist, 3, cacheSample = n > 20000))
    val centroidLit = typedlit(centroids.map(_.toSeq).toSeq)
    // isolated top-2 assignment pass (ids only — measures the kernel, not
    // a vector-bearing cache write)
    val assigned = vecs.select(col("vid").as("id"),
      explode(array_distinct(
        graft_nearest2_centroids(col("cv"), centroidLit))).as("cid"))
    t("assign")(assigned.count())
    val occ = t("occupancy")(assigned.groupBy("cid").agg(count(lit(1)).as("occ"))
      .agg(max("occ").as("mx"), expr("percentile(occ, 0.99)").as("p99"),
        avg("occ").as("avg"), count(lit(1)).as("nonempty")).collect()(0))
    println(s"SEMDIAG occ max=${occ.get(0)} p99=${occ.get(1)} avg=${occ.get(2)} nonempty=${occ.get(3)}")
    val pairs = t("full_operator")(Dedup.semanticNearDup(df, "vec_id", "embedding",
      threshold = 0.99, nlist = nlist, iterations = 3, maxOccupancy = 384))
    println(s"SEMDIAG result_pairs=${pairs.count()}")
    spark.stop()
  }
}
