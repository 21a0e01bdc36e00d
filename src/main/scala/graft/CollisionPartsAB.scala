package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev diagnostic (r16): interleaved A/B of the scale-adaptive collision-
  * join parallelism (Similarity.collisionJoinPartitions) at a big corpus.
  * Arm `fixed` runs the collision verify tail under the session's
  * partition count (the pre-fix plan: at the 1000x corpus that is a
  * ~1 GB/task external sort per side); arm `adaptive` under the derived
  * count (~128 MB/task). Both arms run the production scoring +
  * dedup + count, one JVM, alternating, so box phases are shared.
  *
  * Usage: runMain graft.CollisionPartsAB <dir> [reps]
  */
object CollisionPartsAB {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1000")
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.plans.MemoryDiscipline.spillSafe(
      SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      // the >100x ScaleCheck codec (both arms share it)
      .config("spark.io.compression.codec", "zstd")
      .config("spark.io.compression.zstd.level", "3")
      .config("spark.io.compression.zstd.bufferSize", "256k"), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    import graft.functions.GraftFunctions.graft_cosine
    import graft.operators.Similarity

    val emb = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val n = emb.count()
    val planes = Similarity.adaptivePlanes(n, targetOccupancy = 8)
    val tables = Similarity.tablesForRecall(planes, cosine = 0.97)
    println(s"COLLAB n=$n planes=$planes tables=$tables sessionParts=$cpus")
    val vecs = emb.select(col("vec_id").cast("long").as("id"),
      col("embedding").as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    vecs.count()
    def reclaim(): Unit = { System.gc(); Thread.sleep(3000) }
    def run(label: String, adaptive: Boolean): Unit = {
      val t0 = System.nanoTime()
      val nOut = Similarity.lshVectorCollisionsForDiag(vecs, planes, tables,
        64, adaptiveParts = adaptive)
        .select(col("id1"), col("id2"),
          round(graft_cosine(col("v1"), col("v2")), 4).as("sim"))
        .groupBy("id1", "id2").agg(max("sim").as("sim"))
        .count()
      println(f"COLLAB $label ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$nOut")
      reclaim()
    }
    for (rep <- 1 to reps) {
      run(s"verify_adaptive rep$rep", adaptive = true)
      run(s"verify_fixed rep$rep", adaptive = false)
    }
    vecs.unpersist()
    spark.stop()
  }
}
