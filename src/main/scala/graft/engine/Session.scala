package graft.engine

import org.apache.spark.sql.{Dataset, Encoder, SparkSession}

/** vega-parity session facade (reference: `Context`, src/context.rs:120-129).
  *
  * Wraps SparkSession: every vega `Context` constructor maps to a Spark
  * source. Spark owns scheduling/shuffle/caching (SURVEY §2.10) — this layer
  * only reproduces the reference's API shape and its edge-case semantics.
  */
final class Session(val spark: SparkSession) {

  /** Context::parallelize (src/context.rs:433-442). Slices the collection
    * in order (like the reference's ParallelCollection::slice) — a round-robin
    * repartition would break partition-order-preserving collect/first/take.
    */
  def parallelize[T](seq: Seq[T], numSlices: Int = 0)(implicit e: Encoder[T]): Dataflow[T] = {
    val n = if (numSlices > 0) numSlices else spark.sparkContext.defaultParallelism
    val rdd = spark.sparkContext.parallelize(seq, math.max(1, math.min(n, math.max(1, seq.size))))(e.clsTag)
    new Dataflow(spark.createDataset(rdd))
  }

  /** Context::make_rdd — alias of parallelize (src/context.rs:406-417). */
  def makeRdd[T: Encoder](seq: Seq[T], numSlices: Int = 0): Dataflow[T] =
    parallelize(seq, numSlices)

  /** Context::range — END-INCLUSIVE, unlike Spark (src/context.rs:419-431;
    * asserted by reference tests/test_rdd.rs:524-531).
    */
  def range(start: Long, end: Long, step: Long = 1, numSlices: Int = 0): Dataflow[Long] = {
    // the reference's step is unsigned (context.rs:419-431); the end+1
    // inclusivity shim below is only correct for forward ranges
    require(step > 0, s"range step must be positive, got $step")
    import spark.implicits._
    val ds =
      if (numSlices > 0) spark.range(start, end + 1, step, numSlices).as[Long]
      else spark.range(start, end + 1, step).as[Long]
    new Dataflow(ds)
  }

  /** Context::union over N flows (src/context.rs:537-539). */
  def union[T](flows: Seq[Dataflow[T]]): Dataflow[T] =
    new Dataflow(flows.map(_.ds).reduce(_ union _))

  /** LocalFsReader text flavor (src/io/local_file_reader.rs): line-per-row. */
  def textFile(path: String): Dataflow[String] = {
    import spark.implicits._
    new Dataflow(spark.read.textFile(path))
  }

  /** LocalFsReader whole-file bytes flavor (src/io/local_file_reader.rs:20-78):
    * (path, content-bytes) per file. Spark's binaryFile source bin-packs files
    * into size-balanced partitions, like the reference's mean/σ heuristic.
    * `glob` mirrors the reference's extension filter
    * (local_file_reader.rs:29-35, `.filter(|f| f.ends_with(ext))`) via the
    * source's pathGlobFilter pushdown — files are excluded at listing time,
    * never opened.
    */
  def binaryFiles(path: String, glob: Option[String] = None): Dataset[(String, Array[Byte])] = {
    import spark.implicits._
    val reader = spark.read.format("binaryFile")
    glob.foreach(g => reader.option("pathGlobFilter", g))
    reader.load(path).select("path", "content").as[(String, Array[Byte])]
  }

  /** Context::read_source(config, decoder) composition (src/io/mod.rs:11-16):
    * a raw reader plus a user decoder closure per record. The text flavor —
    * the one the reference's examples exercise (examples/file_read.rs:8-31).
    */
  def readSource[T: Encoder](path: String, decoder: String => T): Dataflow[T] =
    textFile(path).map(decoder)

  /** Parquet read (reference delegates to user code via the path reader,
    * examples/parquet_column_read.rs — Spark's vectorized reader instead).
    */
  def readParquet(path: String) = spark.read.parquet(path)

  def readCsv(path: String, header: Boolean = false) =
    spark.read.option("header", header.toString).csv(path)
}

object Session {
  def apply(spark: SparkSession): Session = new Session(spark)
}
