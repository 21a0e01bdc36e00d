package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev diagnostics main (not part of the driver contract): decompose
  * Similarity.fitCentroids' cost — sample materialization / seed /
  * per-iteration treeAggregate — at a given corpus.
  * Usage: runMain graft.FitDiag [sfDir]
  */
object FitDiag {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf100")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def t[A](what: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"FITDIAG $what ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    val vecs = Tables(spark, dir, "embeddings")
      .select(col("vec_id").cast("long").as("vid"),
        col("embedding").cast("array<double>").as("cv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = t("count")(vecs.count())
    val nlist = math.max(16L, math.min(4096L, n / 48)).toInt
    val fitSet =
      if (n <= 20000) vecs
      else vecs.where(pmod(xxhash64(col("vid")), lit((n + 19999) / 20000)) === 0)
    val idVecRdd = fitSet.select("vid", "cv").as[(Long, Seq[Double])].rdd
      .map { case (id, v) => (id, v.toArray) }
      .repartition(spark.sparkContext.defaultParallelism)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val vecRdd = idVecRdd.map(_._2)
    var centroids: Array[Array[Double]] =
      t("seed")(idVecRdd.takeOrdered(nlist)(Ordering.by(_._1)).map(_._2))
    println(s"FITDIAG n=$n nlist=$nlist sample=${vecRdd.count()} parts=${vecRdd.getNumPartitions}")
    // assign-pass overhead decomposition: cache-read floor, a trivial
    // per-row array op, the top-2 kernel, then kernel+explode
    graft.functions.GraftFunctions.register(spark)
    import graft.functions.GraftFunctions.graft_nearest2_centroids
    val centroidLit = typedlit(centroids.map(_.toSeq).toSeq)
    t("scan_only")(vecs.count())
    t("scan_elem")(vecs.select(element_at(col("cv"), 1).as("x"))
      .agg(sum("x")).collect())
    t("kernel_only")(vecs.select(
      element_at(graft_nearest2_centroids(col("cv"), centroidLit), 1).as("c"))
      .agg(sum("c")).collect())
    t("kernel_again")(vecs.select(
      element_at(graft_nearest2_centroids(col("cv"), centroidLit), 1).as("c"))
      .agg(sum("c")).collect())
    t("kernel_explode")(vecs.select(col("vid").as("id"),
      explode(array_distinct(
        graft_nearest2_centroids(col("cv"), centroidLit))).as("cid")).count())
    for (it <- 1 to 3) {
      val dim = centroids.map(_.length).max
      val bc = t(s"it${it}_broadcast")(spark.sparkContext.broadcast(centroids))
      val (sums, counts) = t(s"it${it}_agg")(vecRdd.treeAggregate(
        (Array.ofDim[Double](nlist, dim), new Array[Long](nlist)))(
        seqOp = { case ((s, cn), v) =>
          val cid = graft.functions.VectorOps.nearestCentroidArr(v, bc.value)
          val row = s(cid)
          var d = 0
          while (d < v.length && d < dim) { row(d) += v(d); d += 1 }
          cn(cid) += 1
          (s, cn)
        },
        combOp = { case ((s1, n1), (s2, n2)) =>
          var i = 0
          while (i < nlist) {
            val a = s1(i); val b = s2(i)
            var d = 0
            while (d < dim) { a(d) += b(d); d += 1 }
            n1(i) += n2(i)
            i += 1
          }
          (s1, n1)
        },
        depth = 2))
      t(s"it${it}_destroy")(bc.destroy())
      centroids = centroids.indices.toArray.map { i =>
        if (counts(i) == 0) centroids(i)
        else sums(i).map(_ / counts(i))
      }
    }
    spark.stop()
  }
}
