package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev diagnostics main (not part of the driver contract): decompose
  * minhashPairs' cost at a corpus — tokenize, shingle-string building,
  * signature, banding join, verify — the SpanDiag discipline for the
  * table's current worst row. Usage: runMain graft.MinhashDiag [sfDir]
  */
object MinhashDiag {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf100")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    import graft.functions.GraftFunctions.{graft_minhash, graft_shingles}

    def t[A](what: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"MINHASHDIAG $what ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"MINHASHDIAG docs=${docs.count()}")
    val toks = filter(split(lower(col("text")), "\\s+"), x => x =!= "")

    t("tokenize")(docs.select(sum(size(toks))).collect())
    t("shingles")(docs.select(sum(size(
      graft_shingles(toks, 3)))).collect())
    t("shingles_sig")(docs.select(sum(size(
      graft_minhash(graft_shingles(toks, 3), 64)))).collect())
    // manual pipeline replication, stage-timed
    locally {
      val sh = docs.select(col("doc_id").as("id"),
        graft_shingles(graft.functions.TextFunctions.tokens(col("text")), 3).as("s"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      t("sh_materialize")(sh.count())
      val banded = sh.select(col("id"),
        explode(graft.functions.TextFunctions.minhashBands(
          graft_minhash(col("s"), 64), 16, 4)).as("bk"))
        .select(col("id"), col("bk.band"), col("bk.bhash"))
      t("banded_count")(banded.groupBy().count().collect())
      val a = banded.select(col("band"), col("bhash"), col("id").as("id1"))
      val b = banded.select(col("band"), col("bhash"), col("id").as("id2"))
      val cand = a.join(b, Seq("band", "bhash"))
        .where(col("id1") < col("id2"))
        .select("id1", "id2")
        .dropDuplicates("id1", "id2")
      t("band_join_dedup")(println("CAND=" + cand.count()))
      sh.unpersist()
      ()
    }
    t("full_minhashPairs")(println("PAIRS=" + graft.operators.Dedup
      .minhashPairs(docs, "doc_id", "text").count()))
    docs.unpersist()
    spark.stop()
  }
}
