package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (array<float>).
  *
  * Baseline: brute-force cosine top-k — a broadcast of the (small) query set
  * against the full corpus; one pass, no shuffle of the corpus side, top-k
  * via window rank. Scale path: hyperplane LSH bucketing so candidate
  * generation touches only same-bucket vectors (IVF-style coarse quantization
  * would slot into the same shape with a learned codebook; the hyperplane
  * variant is fully deterministic and needs no training pass).
  */
object Similarity {

  /** Cosine similarity between two array<double> columns — pure higher-order
    * functions (zip_with + aggregate), fully codegen'd, no UDF.
    */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0d), (acc, v) => acc + v)
    def norm(x: Column): Column = sqrt(dot(x, x))
    dot(a, b) / (norm(a) * norm(b))
  }

  /** Brute-force cosine top-k: every query vector against the whole corpus.
    * Queries are broadcast (they're small); corpus is scanned once.
    * Returns (qid, vid, sim) with sim rounded to 4 for stable ordering.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val c = corpus.select(col(idCol).as("vid"), col(vecCol).cast("array<double>").as("cv"))
    val q = queries.select(col(idCol).as("qid"), col(vecCol).cast("array<double>").as("qv"))
    val scored = c.crossJoin(broadcast(q))
      .withColumn("sim",
        round(graft.functions.GraftFunctions.graft_cosine(col("cv"), col("qv")), 4))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("vid"))
    scored.withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select("qid", "vid", "sim")
  }

  /** IVF-style ANN: a deterministic Lloyd's k-means coarse quantizer
    * (seeded from the nlist lowest-id vectors, fixed iteration count — no
    * RNG, so the index is identical on every cluster), then search only the
    * nprobe nearest inverted lists per query.
    *
    * Scale shape: fit touches the corpus `iterations` times (each a
    * broadcast-join + one shuffle for the centroid update); search touches
    * ~corpus * nprobe / nlist vectors per query. The learned counterpart to
    * hyperplaneSignature's data-oblivious buckets.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nlist: Int = 16, nprobe: Int = 4,
      iterations: Int = 3): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    import graft.functions.GraftFunctions.graft_cosine
    val spark = corpus.sparkSession
    val c = corpus.select(col(idCol).as("vid"), col(vecCol).cast("array<double>").as("cv"))

    // ---- fit: Lloyd's iterations. Centroids are tiny (nlist x dim); they
    // are materialized to the driver each iteration so every later
    // reference is a local relation, not a re-executed k-means lineage.
    def materialize(df: DataFrame): DataFrame = {
      import spark.implicits._
      spark.createDataset(df.select(col("cid"), col("centroid"))
        .as[(Int, Seq[Double])].collect().toSeq).toDF("cid", "centroid")
    }
    var centroids: DataFrame = materialize(
      c.orderBy("vid").limit(nlist)
        .select(row_number().over(Window.orderBy("vid")).as("cid"), col("cv").as("centroid")))
    for (_ <- 1 to iterations) {
      val assigned = c.crossJoin(broadcast(centroids))
        .withColumn("sim", graft_cosine(col("cv"), col("centroid")))
        .withColumn("rn", row_number().over(
          Window.partitionBy("vid").orderBy(col("sim").desc, col("cid"))))
        .where(col("rn") === 1)
        .select("cid", "cv")
      centroids = materialize(assigned
        .select(col("cid"), posexplode(col("cv")).as(Seq("pos", "x")))
        .groupBy("cid", "pos").agg(avg("x").as("x"))
        .groupBy("cid")
        .agg(array_sort(collect_list(struct(col("pos"), col("x")))).as("px"))
        .select(col("cid"), transform(col("px"), e => e.getField("x")).as("centroid")))
    }

    // ---- index: final assignment of each vector to its list ----
    val index = c.crossJoin(broadcast(centroids))
      .withColumn("sim", graft_cosine(col("cv"), col("centroid")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("vid").orderBy(col("sim").desc, col("cid"))))
      .where(col("rn") === 1)
      .select("cid", "vid", "cv")

    // ---- search: probe the nprobe nearest lists per query ----
    val q = queries.select(col(idCol).as("qid"), col(vecCol).cast("array<double>").as("qv"))
    val probes = q.crossJoin(broadcast(centroids))
      .withColumn("csim", graft_cosine(col("qv"), col("centroid")))
      .withColumn("crn", row_number().over(
        Window.partitionBy("qid").orderBy(col("csim").desc, col("cid"))))
      .where(col("crn") <= nprobe)
      .select("qid", "qv", "cid")
    val scored = index.join(broadcast(probes), "cid")
      .withColumn("sim", round(graft_cosine(col("cv"), col("qv")), 4))
    scored.withColumn("rn", row_number().over(
      Window.partitionBy("qid").orderBy(col("sim").desc, col("vid"))))
      .where(col("rn") <= k)
      .select("qid", "vid", "sim")
  }

  /** LSH-bucketed approximate top-k: candidates restricted to the query's
    * hyperplane bucket. Trades recall for touching ~corpus/2^planes vectors
    * per query — the 100 TB path when brute force stops being viable.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, numPlanes: Int = 8): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    import graft.functions.GraftFunctions.{graft_cosine, graft_hyperplane}
    val c = corpus.select(col(idCol).as("vid"), col(vecCol).cast("array<double>").as("cv"))
      .withColumn("bucket", graft_hyperplane(col("cv"), numPlanes))
    val q = queries.select(col(idCol).as("qid"), col(vecCol).cast("array<double>").as("qv"))
      .withColumn("bucket", graft_hyperplane(col("qv"), numPlanes))
    val scored = c.join(broadcast(q), "bucket")
      .withColumn("sim", round(graft_cosine(col("cv"), col("qv")), 4))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("vid"))
    scored.withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select("qid", "vid", "sim")
  }
}
