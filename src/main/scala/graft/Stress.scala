package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale sanity check (dev main, not part of the driver contract):
  * synthesizes a corpus ~40x the sf0.1 documents table and pushes it
  * through the heaviest pipeline operators, verifying wall-time grows
  * roughly linearly (the LSH paths are shuffle-linear by design).
  *
  * Run: sbt "runMain graft.Stress [nDocs] [nVecs]"
  */
object Stress {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(200000)
    val nVecs = args.lift(1).map(_.toInt).getOrElse(100000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"STRESS $label ${(System.nanoTime() - t0) / 1e9}%.1fs"); r
    }

    // synthetic docs: ~50 pseudo-words from a 500-word vocab, deterministic
    val docs = spark.range(nDocs).select(col("id").as("doc_id"),
      concat_ws(" ", transform(sequence(lit(0), lit(49)),
        i => concat(lit("w"), pmod(xxhash64(col("id"), i), lit(500))))).as("text"))
      .repartition(64).cache()
    println(s"DOCS=${docs.count()}")

    time(s"minhashPairs over $nDocs docs") {
      val pairs = operators.Dedup.minhashPairs(docs, "doc_id", "text")
      println("MINHASH_DUPS=" + pairs.count())
    }
    time(s"simhashPairs over $nDocs docs") {
      println("SIMHASH_DUPS=" +
        operators.Dedup.simhashPairs(docs, "doc_id", "text").count())
    }
    time(s"exact dedup over $nDocs docs") {
      println("SURVIVORS=" + operators.Dedup.exact(docs, "doc_id", "text").count())
    }

    // synthetic embeddings: 64-dim deterministic pseudo-random doubles
    val vecs = spark.range(nVecs).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)),
        d => (pmod(xxhash64(col("id"), d), lit(2000)).cast("double") - 1000) / 1000.0)
        .as("embedding"))
      .repartition(64).cache()
    println(s"VECS=${vecs.count()}")

    time(s"embeddingNearDup over $nVecs vecs (12 planes)") {
      println("EMB_DUPS=" + operators.Dedup.embeddingNearDup(
        vecs, "vec_id", "embedding", threshold = 0.95, numPlanes = 12).count())
    }
    time(s"bruteForceTopK 10 queries x $nVecs corpus") {
      println("TOPK=" + operators.Similarity.bruteForceTopK(
        vecs, vecs.where(col("vec_id") < 10), "vec_id", "embedding", 10).count())
    }
    spark.stop()
  }
}
