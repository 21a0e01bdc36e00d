package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev diagnostics main (not part of the driver contract): decompose
  * x_ann_bipartite's cost — banded rows per side, candidate pairs,
  * full annJoin wall — across schedule variants, the KnnDiag/SemDiag
  * discipline applied to the family's steepest 100x curve. Variants:
  *   A: committed schedule (occ-4 planes, cap 64, id-seeded split)
  *   B: content-seeded split, cap 64 (twin contract structural)
  *   C: content-seeded split, cap 16 (aggressive cohabitant bound)
  *   D: occ-2 planes (denser buckets), content seed, cap 16
  * Usage: runMain graft.BipDiag [sfDir] [variants]
  */
object BipDiag {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val variants = args.lift(1).getOrElse("ABCD")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    import graft.operators.Similarity

    def t[A](what: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"BIPDIAG $what ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    val emb = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = emb.count()
    val twins = emb.select((col("vec_id") + 3000000L).as("vec_id"), col("embedding"))
    val perturbed = emb.where(col("vec_id") < 20)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          x * (lit(1.0) + lit(0.03) * when(pmod(i, lit(2)) === 0, lit(1.0))
            .otherwise(lit(-1.0)))).as("embedding"))
    val left = twins.unionByName(perturbed)
    println(s"BIPDIAG n=$n")

    def variant(name: String, planes: Int, tables: Int, cap: Int,
        content: Boolean): Unit = {
      println(s"BIPDIAG variant $name planes=$planes tables=$tables cap=$cap content=$content")
      val l = left.select(col("vec_id").as("lid"), col("embedding").as("lv"))
      val r = emb.select(col("vec_id").as("rid"), col("embedding").as("rv"))
      val pairs = t(s"$name pairs")(Similarity.bipartiteCandidates(
        l, r, planes, tables, cap, content).count())
      println(s"BIPDIAG $name pairs=$pairs perLeft=${pairs / (n + 20)}")
      val topk = t(s"$name annJoin")(Similarity.annJoin(left, emb,
        "vec_id", "embedding", k = 3, numPlanes = planes, numTables = tables,
        maxOccupancy = cap, contentSeededSplit = content))
      val top1 = topk.withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("qid")
          .orderBy(col("sim").desc, col("vid"))))
        .where(col("rn") === 1)
      val twinOk = top1.where(col("qid") >= 3000000L &&
        col("vid") === col("qid") - 3000000L && col("sim") === 1.0).count()
      println(s"BIPDIAG $name twinOk=$twinOk/$n")
    }

    val pA = Similarity.adaptivePlanes(n, targetOccupancy = 4)
    val tA = Similarity.tablesForRecall(pA, cosine = 0.97)
    val pD = Similarity.adaptivePlanes(n, targetOccupancy = 2)
    val tD = Similarity.tablesForRecall(pD, cosine = 0.97)
    if (variants.contains('A')) variant("A", pA, tA, 64, content = false)
    if (variants.contains('B')) variant("B", pA, tA, 64, content = true)
    if (variants.contains('C')) variant("C", pA, tA, 16, content = true)
    if (variants.contains('D')) variant("D", pD, tD, 16, content = true)
    spark.stop()
  }
}
