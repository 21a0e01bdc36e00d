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
      // r16: the executed verify+heap plan — is the (id,v) side's exchange
      // REUSED between the two join-backs (canonicalized-identical
      // subtrees), and what does each exchange actually carry?
      locally {
        val out = graft.operators.Similarity.knnVerifyTopK(pairs, vecs, 10)
        out.collect()
        println("DIAG executed plan knnVerifyTopK:")
        println(out.queryExecution.executedPlan.toString.take(8000))
      }
      pairs.unpersist()
      // full operators for reference, at each one's own adaptive schedule
      time("full_knnJoin") {
        graft.operators.Similarity.knnJoin(emb, "vec_id", "embedding", k = 10,
          numPlanes = planes, numTables = tables).count()
      }
      // r16 shape experiment (guide §2.3/§8: move heavy bytes once): score
      // INSIDE the bucket self-join — vectors ride the (t,bucket) exchange
      // at n*tables rows and the pair stream carries only (id1,id2,sim);
      // dedup AFTER scoring (sim per pair is deterministic, so max == the
      // value). vs the current shape whose id2-side join streams
      // pairs x (ids + v1) — at 100x that exchange is ~7 GB while the
      // banded-with-vector sides total ~2.6 GB.
      locally {
        import graft.functions.GraftFunctions.graft_hyperplanes
        val cap = 64
        def scoredInline(): org.apache.spark.sql.DataFrame = {
          val bandedV = vecs.select(col("id"), col("id").as("__ck"), col("v"),
            posexplode(graft_hyperplanes(col("v"), planes, tables))
              .as(Seq("t", "bucket")))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          val over = bandedV.groupBy("t", "bucket")
            .agg(count(lit(1)).as("occ"))
            .where(col("occ") > cap)
          val banded = bandedV.join(broadcast(over), Seq("t", "bucket"), "left")
            .withColumn("sub", when(col("occ").isNull, lit(0L)).otherwise(
              pmod(xxhash64(col("__ck"), col("t")),
                ceil(col("occ") / cap).cast("long"))))
            .drop("occ")
          val a = banded.select(col("t"), col("bucket"), col("sub"),
            col("id").as("id1"), col("v").as("v1"))
          val b = banded.select(col("t"), col("bucket"), col("sub"),
            col("id").as("id2"), col("v").as("v2"))
          val scored = a.join(b.hint("shuffle_hash"), Seq("t", "bucket", "sub"))
            .where(col("id1") < col("id2"))
            .select(col("id1"), col("id2"),
              round(graft_cosine(col("v1"), col("v2")), 4).as("sim"))
            .groupBy("id1", "id2").agg(max("sim").as("sim"))
          val sym = scored.select(explode(array(
            struct(col("id1").as("qid"), col("id2").as("vid"), col("sim")),
            struct(col("id2").as("qid"), col("id1").as("vid"), col("sim")))).as("e"))
            .select(col("e.qid").as("qid"), col("e.vid").as("vid"),
              col("e.sim").as("sim"))
          val out = sym
            .groupBy("qid")
            .agg(graft.functions.GraftFunctions.graft_topk(
              col("vid").cast("long"), col("sim").cast("double"), 10).as("tk"))
            .select(col("qid"), explode(col("tk")).as("e"))
            .select(col("qid"), col("e.vid").as("vid"), col("e.sim").as("sim"))
            .localCheckpoint(true)
          bandedV.unpersist(blocking = false)
          out
        }
        // variant D: NO wide cache — both join sides recompute the banded
        // frame from the vecs cache; if ReuseExchange unifies the two
        // canonically-identical (t,bucket,sub) exchanges, this is one
        // signature pass + ONE wide exchange, with zero cache pressure
        def scoredNoCache(checkpoint: Boolean = true, smj: Boolean = false): org.apache.spark.sql.DataFrame = {
          def bandedV() = vecs.select(col("id"), col("id").as("__ck"), col("v"),
            posexplode(graft_hyperplanes(col("v"), planes, tables))
              .as(Seq("t", "bucket")))
          val over = bandedV().groupBy("t", "bucket")
            .agg(count(lit(1)).as("occ"))
            .where(col("occ") > cap)
          def side(idN: String, vN: String) =
            bandedV().join(broadcast(over), Seq("t", "bucket"), "left")
              .withColumn("sub", when(col("occ").isNull, lit(0L)).otherwise(
                pmod(xxhash64(col("__ck"), col("t")),
                  ceil(col("occ") / cap).cast("long"))))
              .select(col("t"), col("bucket"), col("sub"),
                col("id").as(idN), col("v").as(vN))
          val sideB = if (smj) side("id2", "v2")
            else side("id2", "v2").hint("shuffle_hash")
          val scored = side("id1", "v1")
            .join(sideB, Seq("t", "bucket", "sub"))
            .where(col("id1") < col("id2"))
            .select(col("id1"), col("id2"),
              round(graft_cosine(col("v1"), col("v2")), 4).as("sim"))
            .groupBy("id1", "id2").agg(max("sim").as("sim"))
          val sym = scored.select(explode(array(
            struct(col("id1").as("qid"), col("id2").as("vid"), col("sim")),
            struct(col("id2").as("qid"), col("id1").as("vid"), col("sim")))).as("e"))
            .select(col("e.qid").as("qid"), col("e.vid").as("vid"),
              col("e.sim").as("sim"))
          val out2 = sym.groupBy("qid")
            .agg(graft.functions.GraftFunctions.graft_topk(
              col("vid").cast("long"), col("sim").cast("double"), 10).as("tk"))
            .select(col("qid"), explode(col("tk")).as("e"))
            .select(col("qid"), col("e.vid").as("vid"), col("e.sim").as("sim"))
          if (checkpoint) out2.localCheckpoint(true) else out2
        }
        // interleaved A/B (the box's parallel throughput swings >2x across
        // minutes — alternating samples see the same phases)
        for (rep <- 1 to 3) {
          time(s"ab_current rep$rep") {
            graft.operators.Similarity.knnJoin(emb, "vec_id", "embedding",
              k = 10, numPlanes = planes, numTables = tables).count()
          }
          time(s"ab_inline rep$rep") { scoredInline().count() }
          time(s"ab_nocache rep$rep") { scoredNoCache().count() }
          time(s"ab_nocache_smj rep$rep") { scoredNoCache(smj = true).count() }
        }
        locally {
          val d = scoredNoCache(checkpoint = false)
          d.collect()
          val plan = d.queryExecution.executedPlan.toString
          println("DIAG nocache reused_exchanges=" +
            "ReusedExchange".r.findAllIn(plan).length +
            " exchanges=" + "\\) Exchange hash".r.findAllIn(plan).length)
          java.nio.file.Files.write(
            java.nio.file.Paths.get("/tmp/r16_knn_nocache_plan.txt"),
            plan.getBytes("UTF-8"))
        }
        // output equality vs the shipped shape (set-exact, not just counts)
        val cur = graft.operators.Similarity.knnJoin(emb, "vec_id",
          "embedding", k = 10, numPlanes = planes, numTables = tables)
        val alt = scoredInline()
        println("DIAG inline_vs_current only_in_cur=" +
          cur.except(alt).count() + " only_in_alt=" + alt.except(cur).count())
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
