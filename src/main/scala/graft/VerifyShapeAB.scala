package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev diagnostic (r16): interleaved old-vs-new A/B of the verify shape
  * per OPERATOR SCHEDULE, at any corpus. The r16 scored-bucket-join
  * restructure (Similarity.lshVectorCollisions) was proven 2x on
  * x_knn_join's schedule (occupancy 8) at 100x — but the collision stream
  * carries TWO vectors per collision while the old pair stream carried
  * one vector per deduped pair, so the byte trade is
  * 2 x n x tables x vec  vs  pairs x vec: the new shape wins only where
  * pairs/(n x tables) (~ per-table occupancy crowd) clears ~2. knn sits
  * at 3.6-5.7; x_dedup_embedding's occupancy-2 verifier schedule at ~1.0
  * and x_ann_ingest's asymmetric occ-4 at ~0.8 — exactly the rows the
  * r16 10x ScaleCheck regeneration flagged (dedup_embedding ratio10
  * 1.6 -> 7.9). This main measures each schedule old-vs-new end to end,
  * interleaved (the box's throughput swings across minutes), on DISK
  * shuffle (the ScaleCheck condition — no tmpfs gate).
  *
  * Usage: runMain graft.VerifyShapeAB <dir> [moreDirs...] ("10x:/tmp/d"
  * materializes first, ScaleCheck-style). Reps via SPARK_GRAFT_AB_REPS
  * (default 3).
  */
object VerifyShapeAB {
  def main(args: Array[String]): Unit = {
    val reps = sys.env.getOrElse("SPARK_GRAFT_AB_REPS", "3").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    import graft.operators.{Dedup, Similarity}

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"AB $label ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
    }

    for (arg <- args) {
      val dir = arg.split(":", 2) match {
        case Array(f, out) if f.endsWith("x") =>
          ScaleCheck.materialize(spark, "/root/testdata/sf0.1", out,
            f.dropRight(1).toInt)
          out
        case _ => arg
      }
      println(s"===== $dir =====")
      val emb = Tables(spark, dir, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
      val n = emb.count()

      // --- x_dedup_embedding's schedule: occupancy-2 verifier ---
      val planesD = Similarity.adaptivePlanes(n, targetOccupancy = 2)
      val tablesD = Similarity.tablesForRecall(planesD, cosine = 0.95)
      println(s"AB n=$n dedup planes=$planesD tables=$tablesD")
      def dedupOld(): Long = {
        val vecs = emb.select(col("vec_id").as("id"),
          col("embedding").as("v"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val (cand, release) = Similarity.lshCandidatePairsForDiagManaged(
          vecs, planesD, tablesD, 32)
        val out = Dedup.embeddingVerify(cand, vecs, 0.95).count()
        release(); vecs.unpersist()
        out
      }
      def dedupNew(): Long =
        Dedup.embeddingNearDup(emb, "vec_id", "embedding", threshold = 0.95,
          numPlanes = planesD, numTables = tablesD).count()

      // --- x_ann_ingest's schedule: asymmetric bipartite, occ-4 sizing ---
      val index = emb.where(pmod(col("vec_id"), lit(10)) === 0)
      val nIdx = index.count()
      val ingest = emb.select((col("vec_id") + 3000000L).as("vec_id"),
        col("embedding"))
      val planesI = Similarity.adaptivePlanesBipartite(n, nIdx,
        targetOccupancy = 4)
      val tablesI = Similarity.tablesForRecall(planesI, cosine = 0.97)
      println(s"AB nIdx=$nIdx ingest planes=$planesI tables=$tablesI")
      def ingestOld(): Long = {
        import graft.functions.GraftFunctions.graft_cosine
        val l = ingest.select(col("vec_id").cast("long").as("lid"),
          col("embedding").as("lv"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val r = index.select(col("vec_id").cast("long").as("rid"),
          col("embedding").as("rv"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val cand = Similarity.bipartiteCandidates(l, r, planesI, tablesI,
          maxOccupancy = 16, contentSeededSplit = true)
        val scored = cand
          .join(l.hint("shuffle_hash"), "lid")
          .join(r.hint("shuffle_hash"), "rid")
          .withColumn("sim", round(graft_cosine(col("lv"), col("rv")), 4))
          .select(col("lid").as("qid"), col("rid").as("vid"), col("sim"))
        val out = Similarity.topKPerQuery(scored, 3).count()
        l.unpersist(); r.unpersist()
        out
      }
      def ingestNew(): Long =
        Similarity.annJoin(ingest, index, "vec_id", "embedding", k = 3,
          numPlanes = planesI, numTables = tablesI, maxOccupancy = 16,
          contentSeededSplit = true).count()

      // --- x_ann_bipartite's schedule: symmetric bipartite, occ-4 ---
      val planesB = Similarity.adaptivePlanes(n, targetOccupancy = 4)
      val tablesB = Similarity.tablesForRecall(planesB, cosine = 0.97)
      println(s"AB bipartite planes=$planesB tables=$tablesB")
      val twins = emb.select((col("vec_id") + 3000000L).as("vec_id"),
        col("embedding"))
      def bipOld(): Long = {
        import graft.functions.GraftFunctions.graft_cosine
        val l = twins.select(col("vec_id").cast("long").as("lid"),
          col("embedding").as("lv"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val r = emb.select(col("vec_id").cast("long").as("rid"),
          col("embedding").as("rv"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val cand = Similarity.bipartiteCandidates(l, r, planesB, tablesB,
          maxOccupancy = 16, contentSeededSplit = true)
        val scored = cand
          .join(l.hint("shuffle_hash"), "lid")
          .join(r.hint("shuffle_hash"), "rid")
          .withColumn("sim", round(graft_cosine(col("lv"), col("rv")), 4))
          .select(col("lid").as("qid"), col("rid").as("vid"), col("sim"))
        val out = Similarity.topKPerQuery(scored, 3).count()
        l.unpersist(); r.unpersist()
        out
      }
      def bipNew(): Long =
        Similarity.annJoin(twins, emb, "vec_id", "embedding", k = 3,
          numPlanes = planesB, numTables = tablesB, maxOccupancy = 16,
          contentSeededSplit = true).count()

      for (rep <- 1 to reps) {
        time(s"dedup_old rep$rep")(dedupOld())
        time(s"dedup_new rep$rep")(dedupNew())
        time(s"ingest_old rep$rep")(ingestOld())
        time(s"ingest_new rep$rep")(ingestNew())
        time(s"bip_old rep$rep")(bipOld())
        time(s"bip_new rep$rep")(bipNew())
      }
    }
    spark.stop()
  }
}
