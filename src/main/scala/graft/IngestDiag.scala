package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev diagnostics main (not part of the driver contract): A/B the
  * x_ann_ingest schedule at a given corpus — per-side sizing (planes from
  * the INDEX occupancy) vs the symmetric habit (planes from the ingest
  * corpus count) — pairs, banded-row volume, and full annJoin wall. The
  * asymmetric twin of BipDiag: r9 measured the per-side lever moot on the
  * symmetric fixture; this is the fixture where it has to earn its keep.
  * Usage: runMain graft.IngestDiag [sfDir]
  */
object IngestDiag {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf100")
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
      println(f"INGESTDIAG $what ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    val emb = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = emb.count()
    val index = emb.where(pmod(col("vec_id"), lit(10)) === 0)
    val nIdx = index.count()
    val ingest = emb.select((col("vec_id") + 3000000L).as("vec_id"),
      col("embedding"))
    val probes = index.where(col("vec_id") < 200)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          x * (lit(1.0) + lit(0.03) * when(pmod(i, lit(2)) === 0, lit(1.0))
            .otherwise(lit(-1.0)))).as("embedding"))
    val left = ingest.unionByName(probes)
    println(s"INGESTDIAG n=$n nIdx=$nIdx")

    def variant(name: String, planes: Int, tables: Int): Unit = {
      println(s"INGESTDIAG variant $name planes=$planes tables=$tables")
      val l = left.select(col("vec_id").as("lid"), col("embedding").as("lv"))
      val r = index.select(col("vec_id").as("rid"), col("embedding").as("rv"))
      val pairs = t(s"$name pairs")(Similarity.bipartiteCandidates(
        l, r, planes, tables, 16, contentSeededSplit = true).count())
      println(f"INGESTDIAG $name pairs=$pairs perIngestRow=${pairs.toDouble / (n + 20)}%.1f")
      val topk = t(s"$name annJoin")(Similarity.annJoin(left, index,
        "vec_id", "embedding", k = 3, numPlanes = planes, numTables = tables,
        maxOccupancy = 16, contentSeededSplit = true))
      val twinOk = topk.withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("qid")
          .orderBy(col("sim").desc, col("vid"))))
        .where(col("rn") === 1)
        .where(col("qid") >= 3000000L &&
          pmod(col("qid") - 3000000L, lit(10)) === 0 &&
          col("vid") === col("qid") - 3000000L && col("sim") === 1.0).count()
      println(s"INGESTDIAG $name twinOk=$twinOk/$nIdx")
    }

    val pSide = Similarity.adaptivePlanes(nIdx, targetOccupancy = 4)
    val pSym = Similarity.adaptivePlanes(n, targetOccupancy = 4)
    val which = args.lift(1).getOrElse("PS")
    if (which.contains("P"))
      variant("perSide", pSide, Similarity.tablesForRecall(pSide, cosine = 0.97))
    if (which.contains("S"))
      variant("symmetric", pSym, Similarity.tablesForRecall(pSym, cosine = 0.97))
    if (which.contains("D")) {
      val p = pSym + 2
      variant("deeper", p, Similarity.tablesForRecall(p, cosine = 0.97))
    }
    if (which.contains("G")) {
      val p = Similarity.adaptivePlanes(
        math.round(math.sqrt(n.toDouble * nIdx)), targetOccupancy = 4)
      variant("geomean", p, Similarity.tablesForRecall(p, cosine = 0.97))
    }
    spark.stop()
  }
}
