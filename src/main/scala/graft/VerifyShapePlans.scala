package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev instrumentation (r16): dump `.explain("formatted")` for the ANN/dedup
  * verify pipelines BEFORE and AFTER the r16 scored-bucket-join restructure.
  * The declared queries' own plans end at a localCheckpoint scan (the
  * operators materialize eagerly for cache hygiene), so the operator-level
  * plans here are the reviewable before/after evidence: the "before" files
  * show the pairs x vector exchange feeding the second join-back; the
  * "after" files show vectors riding the (t, bucket, sub) exchanges and an
  * ids+sim-only pair stream. Usage: runMain graft.VerifyShapePlans <outDir>
  */
object VerifyShapePlans {
  def main(args: Array[String]): Unit = {
    val outDir = if (args.nonEmpty) args(0) else "plans/r16"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.plans.ShuffleDiscipline.gateLocal(
      graft.plans.MemoryDiscipline.spillSafe(SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.extensions", "graft.functions.GraftExtensions"),
        cpus.toInt))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    import graft.functions.GraftFunctions.graft_cosine
    import graft.operators.{Dedup, Similarity}
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit =
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"$name.txt"),
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode).getBytes("UTF-8"))

    val emb = Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val n = emb.count()
    val planes = Similarity.adaptivePlanes(n, targetOccupancy = 8)
    val tables = Similarity.tablesForRecall(planes, cosine = 0.97)
    val vecs = emb.select(col("vec_id").as("id"), col("embedding").as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    vecs.count()

    // x_knn_join's verify pipeline, old shape: ids-only candidates + two
    // vector join-backs (the pairs x vector exchange is the id2-side join's
    // streamed input)
    val (cand, release) = Similarity.lshCandidatePairsForDiagManaged(
      vecs, planes, tables, 64)
    dump("x_knn_join_verify_before", Similarity.knnVerifyTopK(cand, vecs, 10))
    release()
    // new shape: score inside the bucket join, ids+sim-only pair stream
    val scored = Similarity.lshVectorCollisionsForDiag(vecs, planes, tables, 64)
      .select(col("id1"), col("id2"),
        round(graft_cosine(col("v1"), col("v2")), 4).as("sim"))
      .groupBy("id1", "id2").agg(max("sim").as("sim"))
    dump("x_knn_join_verify_after", Similarity.symmetricTopK(scored, 10))

    // x_dedup_embedding's verify pipeline, both shapes
    val planesD = Similarity.adaptivePlanes(n, targetOccupancy = 2)
    val tablesD = Similarity.tablesForRecall(planesD, cosine = 0.95)
    val (candD, releaseD) = Similarity.lshCandidatePairsForDiagManaged(
      vecs, planesD, tablesD, 32)
    dump("x_dedup_embedding_verify_before",
      Dedup.embeddingVerifyPlanForDiag(candD, vecs, 0.95))
    releaseD()
    dump("x_dedup_embedding_verify_after",
      Similarity.lshVectorCollisionsForDiag(vecs, planesD, tablesD, 32)
        .withColumn("cosine", graft_cosine(col("v1"), col("v2")))
        .where(col("cosine") >= 0.95)
        .select("id1", "id2", "cosine")
        .dropDuplicates("id1", "id2"))

    // r16 Change 7: the adaptive collision-join repartition — absent at
    // gate SF (derived count <= session partitions, so the after-plans
    // above are unchanged), present when the banded stream outgrows the
    // session layout. Dump the ENGAGED plan via a small target so the
    // artifact shows the explicit same-key repartition replacing the
    // implicit join exchange (one hashpartitioning(t,bucket,sub,N) per
    // side, no extra Exchange).
    dump("x_knn_join_verify_after_engaged",
      Similarity.lshVectorCollisionsForDiag(vecs, planes, tables, 64,
        targetPartitionBytes = 1024L)
        .select(col("id1"), col("id2"),
          round(graft_cosine(col("v1"), col("v2")), 4).as("sim"))
        .groupBy("id1", "id2").agg(max("sim").as("sim")))

    vecs.unpersist()
    spark.stop()
    println(s"PLANS written to $outDir")
  }
}
