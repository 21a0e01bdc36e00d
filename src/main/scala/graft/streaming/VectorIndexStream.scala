package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming ANN index maintenance: vectors arriving on a stream are
  * signature-bucketed (OR-amplified hyperplane LSH, same kernels as
  * operators.Similarity) and appended to a (table, bucket)-partitioned
  * parquet index inside foreachBatch — the incremental-refresh path for a
  * corpus that grows by ingestion instead of nightly rebuilds.
  *
  * Probing reads ONLY the partitions matching the query's own buckets
  * (partition pruning on the directory keys), so a probe touches
  * ~numTables/2^numPlanes of the index regardless of corpus size.
  *
  * At scale: per-batch appends create one file per touched partition —
  * pair this with periodic compaction of hot buckets; the write itself is
  * idempotent per micro-batch id if the sink directory is keyed by batchId
  * (kept simple here; exactly-once bookkeeping is the sink's concern).
  */
object VectorIndexStream {

  /** Bucket a batch of (idCol, vecCol) rows and append to the index. */
  def appendToIndex(batch: DataFrame, indexPath: String,
      numPlanes: Int = 8, numTables: Int = 8): Unit = {
    graft.functions.GraftFunctions.register(batch.sparkSession)
    import graft.functions.GraftFunctions.graft_hyperplanes
    batch.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .select(col("vec_id"), col("v"),
        posexplode(graft_hyperplanes(col("v"), numPlanes, numTables))
          .as(Seq("t", "bucket")))
      // repartition on the partition keys BEFORE the dynamic-partition
      // write: each (t, bucket) directory is then written by exactly one
      // task, so the batch appends ~#dirs files instead of #dirs x #tasks —
      // the difference between linear file growth and a small-files
      // explosion under frequent micro-batches
      .repartition(col("t"), col("bucket"))
      .write.mode("append").partitionBy("t", "bucket").parquet(indexPath)
  }

  /** Attach the index-refresh sink to a streaming vector frame. */
  def indexSink(vecStream: DataFrame, indexPath: String,
      numPlanes: Int = 8, numTables: Int = 8) =
    vecStream.writeStream.foreachBatch {
      (batch: DataFrame, _: Long) => appendToIndex(batch, indexPath, numPlanes, numTables)
    }

  /** Probe the on-disk index: candidates from the query's own buckets only —
    * the bucket list is collected (numTables rows per query) and pushed as a
    * STATIC predicate on the partition columns, so the scan prunes
    * directories before reading a byte. Exact cosine verify, bounded-heap
    * top-k.
    */
  def probe(spark: SparkSession, indexPath: String, queries: DataFrame,
      k: Int, numPlanes: Int = 8, numTables: Int = 8): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    import graft.functions.GraftFunctions.{graft_cosine, graft_hyperplanes}
    val q = queries.select(col("vec_id").as("qid"),
      col("embedding").cast("array<double>").as("qv"))
      .select(col("qid"), col("qv"),
        posexplode(graft_hyperplanes(col("qv"), numPlanes, numTables))
          .as(Seq("t", "bucket")))
    val wanted = q.select("t", "bucket").dropDuplicates()
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    require(wanted.nonEmpty, "no query buckets")
    val prune = wanted.map { case (t, b) =>
      col("t") === t && col("bucket") === b
    }.reduce(_ || _)
    val index = spark.read.parquet(indexPath).where(prune)
      .select(col("t"), col("bucket"), col("vec_id").as("vid"), col("v"))
    val scored = index.join(broadcast(q), Seq("t", "bucket"))
      .withColumn("sim", round(graft_cosine(col("v"), col("qv")), 4))
      .groupBy("qid", "vid").agg(max("sim").as("sim"))
    graft.operators.Similarity.topKPerQuery(scored, k)
  }
}
