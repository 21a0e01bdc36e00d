package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev diagnostics main (not part of the driver contract): decompose the
  * x_knn_join / x_dedup_embedding cost at a given corpus scale into its
  * stages — signature/banding, bucket occupancy, candidate-pair counts,
  * score join — so the scale-curve work targets the stage that actually
  * grows. Usage: runMain graft.KnnDiag <embeddingsDir> [moreDirs...]
  */
object KnnDiag {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    import graft.functions.GraftFunctions.{graft_cosine, graft_hyperplanes}

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"DIAG $label ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    for (arg <- args) {
      // "10x:/tmp/graft_sf1" materializes a replicated corpus there first
      val dir = arg.split(":", 2) match {
        case Array(f, out) if f.endsWith("x") =>
          ScaleCheck.materialize(spark, "/root/testdata/sf0.1", out, f.dropRight(1).toInt)
          out
        case _ => arg
      }
      println(s"===== $dir =====")
      val emb = Tables(spark, dir, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
      val n = emb.count()
      val planes = graft.operators.Similarity.adaptivePlanes(n, targetOccupancy = 8)
      val tables = graft.operators.Similarity.tablesForRecall(planes, cosine = 0.97)
      println(s"DIAG n=$n knn planes=$planes tables=$tables")
      val vecs = emb.select(col("vec_id").as("id"), col("embedding").as("v"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      vecs.count()

      // stage 1: signature computation alone (hash only, count sink)
      time("signatures") {
        vecs.select(posexplode(graft_hyperplanes(col("v"), planes, tables))
          .as(Seq("t", "bucket"))).groupBy().count().collect()
      }
      // occupancy stats per (t,bucket)
      val occ = vecs.select(col("id"),
        posexplode(graft_hyperplanes(col("v"), planes, tables)).as(Seq("t", "bucket")))
        .groupBy("t", "bucket").count()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val stats = occ.agg(
        count(lit(1)).as("n_buckets"),
        max("count").as("max_occ"),
        expr("percentile_approx(count, 0.99)").as("p99_occ"),
        avg("count").as("avg_occ"),
        sum(col("count") * (col("count") - 1) / 2).as("sum_pairs_prededup")).collect()(0)
      println(s"DIAG occupancy $stats")
      occ.unpersist()

      // stage 2: candidate pairs (bucket join + dedup), cap off vs on
      for (cap <- Seq(0, 64); rep <- 1 to 2) time(s"candidate_pairs cap=$cap rep$rep") {
        graft.operators.Similarity.lshCandidatePairsForDiag(vecs, planes, tables, cap).count()
      }
      val pairs = time("candidate_pairs") {
        val p = graft.operators.Similarity
          .lshCandidatePairsForDiag(vecs, planes, tables)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        println(s"DIAG n_pairs_distinct=${p.count()}")
        p
      }
      // stage 3: vector re-join + score
      time("score_join") {
        pairs.join(vecs.select(col("id").as("id1"), col("v").as("v1")), "id1")
          .join(vecs.select(col("id").as("id2"), col("v").as("v2")), "id2")
          .withColumn("sim", round(graft_cosine(col("v1"), col("v2")), 4))
          .groupBy().agg(sum("sim")).collect()
      }
      // stage 3b: same join with the build side hash-hinted (no sort of
      // the pair stream)
      for (rep <- 1 to 2) time(s"score_join_hash rep$rep") {
        pairs.join(vecs.select(col("id").as("id1"), col("v").as("v1"))
            .hint("shuffle_hash"), "id1")
          .join(vecs.select(col("id").as("id2"), col("v").as("v2"))
            .hint("shuffle_hash"), "id2")
          .withColumn("sim", round(graft_cosine(col("v1"), col("v2")), 4))
          .groupBy().agg(sum("sim")).collect()
      }
      pairs.unpersist()
      // full operators for reference, at each one's own adaptive schedule
      time("full_knnJoin") {
        graft.operators.Similarity.knnJoin(emb, "vec_id", "embedding", k = 10,
          numPlanes = planes, numTables = tables).count()
      }
      val planesD = graft.operators.Similarity.adaptivePlanes(n, targetOccupancy = 2)
      val tablesD = graft.operators.Similarity.tablesForRecall(planesD, cosine = 0.95)
      println(s"DIAG n=$n dedup planes=$planesD tables=$tablesD")
      time("dedup_pairs") {
        println("DIAG n_pairs_dedup_schedule=" + graft.operators.Similarity
          .lshCandidatePairsForDiag(vecs, planesD, tablesD, maxOccupancy = 32).count())
      }
      time("full_embeddingNearDup") {
        graft.operators.Dedup.embeddingNearDup(emb, "vec_id", "embedding",
          threshold = 0.95, numPlanes = planesD, numTables = tablesD).count()
      }
      vecs.unpersist()
    }
    spark.stop()
  }
}
