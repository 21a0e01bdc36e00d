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

  /** Probe the on-disk index: candidates from the query's own buckets only.
    *
    * Directory pruning is done by PATH SELECTION, not by predicate: the
    * distinct (t, bucket) set is collected and intersected with the
    * index's partition directories, and the scan reads only the matching
    * paths. The r5 version OR-ed one `t = x AND bucket = y` disjunct per
    * bucket into a static filter, whose Catalyst predicate tree grew with
    * the QUERY-SET size (thousands of queries x 8 tables = tens of
    * thousands of disjuncts — analysis time blows up long before data
    * does). Both the collect and the path list here are capped by the
    * INDEX LAYOUT — at most numTables x 2^numPlanes directories — so
    * probe planning cost is flat from 1 query to 1 million; only the
    * (broadcast) bucket-join fan-out grows with queries, as it must.
    * Exact cosine verify, bounded-heap top-k.
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
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    require(wanted.nonEmpty, "no query buckets")
    // Hadoop FS listing of the two-level partition tree (<= numTables x
    // 2^numPlanes dirs — layout-bounded, like the scan's own file index)
    val root = new org.apache.hadoop.fs.Path(indexPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bucketRe = "^t=(\\d+)/bucket=(\\d+)$".r
    val paths = fs.globStatus(new org.apache.hadoop.fs.Path(root, "t=*/bucket=*"))
      .toSeq.map(_.getPath)
      .filter { p =>
        val rel = s"${p.getParent.getName}/${p.getName}"
        rel match {
          case bucketRe(t, b) => wanted.contains((t.toInt, b.toLong))
          case _ => false
        }
      }
    val scored =
      if (paths.isEmpty) {
        // every query hashed to buckets no vector has landed in yet —
        // id types derive from the caller's query frame, not hardcoded,
        // so the schema matches the non-empty branch for any id dtype
        val idType = q.schema("qid").dataType
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("qid", idType),
            org.apache.spark.sql.types.StructField("vid", idType),
            org.apache.spark.sql.types.StructField("sim",
              org.apache.spark.sql.types.DoubleType))))
      } else {
        val index = spark.read.option("basePath", indexPath)
          .parquet(paths.map(_.toString): _*)
          .select(col("t"), col("bucket"), col("vec_id").as("vid"), col("v"))
        index.join(broadcast(q), Seq("t", "bucket"))
          .withColumn("sim", round(graft_cosine(col("v"), col("qv")), 4))
          .groupBy("qid", "vid").agg(max("sim").as("sim"))
      }
    graft.operators.Similarity.topKPerQuery(scored, k)
  }
}
