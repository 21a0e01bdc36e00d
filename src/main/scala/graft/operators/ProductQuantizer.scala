package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) + asymmetric-distance (ADC) search — the
  * third rung of the vector-compression ladder after float32 and scalar
  * int8: split each d-dim vector into m subspaces, learn a small k-means
  * codebook per subspace, and store each vector as m code ids (one byte
  * each here) — 32x fewer bytes than float32 at d=64, m=8. Jégou et al.,
  * "Product Quantization for Nearest Neighbor Search", TPAMI 2011 — the
  * architecture FAISS's IVF-PQ indexes use at billion-vector scale.
  *
  * Scale shape mirrors Similarity.ivfTopK's fit:
  *  - fit: ONE treeAggregate per Lloyd's iteration covering ALL m
  *    subspaces at once — each partition accumulates m*k partial
  *    (sum, count) pairs against the broadcast codebooks; zero corpus
  *    shuffle, zero replication. Seeding is the k lowest-id vectors'
  *    subvectors (TakeOrderedAndProject — deterministic on any layout).
  *  - encode: a NARROW projection — m calls to the native
  *    graft_nearest_centroid expression over slice()s of the vector, each
  *    against an (k x subDim) codebook literal. No UDF, no shuffle.
  *  - search (ADC): the query never decodes the corpus. Per query, a
  *    (m x k) dot-product table against every codebook entry is computed
  *    ONCE on the driver (queries are small by the same contract every
  *    ANN path here uses) and broadcast; scoring a corpus vector is m
  *    table lookups — zip_with(codes, table, element_at) — instead of d
  *    multiplies. Code norms are query-independent and ride a literal.
  *    The only exchange is graft_topk's O(partitions * k) heap rows.
  */
object ProductQuantizer {

  /** codes(j)(c) = the c-th centroid of subspace j (subDim doubles). */
  case class Codebook(m: Int, subDim: Int, codes: Array[Array[Array[Double]]])

  /** Deterministic per-subspace k-means over the corpus: all m subspaces
    * fit in the same treeAggregate passes. kCodes <= 127 so a code id
    * always fits a tinyint.
    */
  def fit(corpus: DataFrame, vecCol: String, idCol: String, m: Int,
      kCodes: Int, iterations: Int): Codebook = {
    require(kCodes >= 1 && kCodes <= 127, s"kCodes $kCodes must fit a tinyint")
    val spark = corpus.sparkSession
    import spark.implicits._
    val vecs = corpus
      .select(col(idCol).cast("long").as("vid"),
        col(vecCol).cast("array<double>").as("v"))
    val seed = vecs.orderBy("vid").limit(kCodes).select("v").collect()
      .map(_.getSeq[Double](0).toArray)
    require(seed.nonEmpty, s"fit: corpus has no rows with a non-null '$vecCol'")
    val dim = seed.map(_.length).max
    require(dim % m == 0, s"dim $dim not divisible by m=$m subspaces")
    val subDim = dim / m
    // seed subspace j's codebook from the same k vectors' j-th slices; if
    // the corpus has fewer than kCodes rows the codebook is just smaller
    var codes: Array[Array[Array[Double]]] = Array.tabulate(m) { j =>
      seed.map(v => v.slice(j * subDim, (j + 1) * subDim))
    }
    val k = codes(0).length
    val rdd = vecs.select("v").as[Seq[Double]].rdd.map(_.toArray)
    for (_ <- 1 to iterations) {
      val bc = spark.sparkContext.broadcast(codes)
      val (sums, counts) = rdd.treeAggregate(
        (Array.ofDim[Double](m, k, subDim), Array.ofDim[Long](m, k)))(
        seqOp = { case ((s, n), v) =>
          var j = 0
          while (j < m) {
            val sub = v.slice(j * subDim, (j + 1) * subDim)
            val c = graft.functions.VectorOps.nearestCentroidArr(sub, bc.value(j))
            val row = s(j)(c)
            var d = 0
            while (d < sub.length && d < subDim) { row(d) += sub(d); d += 1 }
            n(j)(c) += 1
            j += 1
          }
          (s, n)
        },
        combOp = { case ((s1, n1), (s2, n2)) =>
          var j = 0
          while (j < m) {
            var c = 0
            while (c < k) {
              val a = s1(j)(c); val b = s2(j)(c)
              var d = 0
              while (d < subDim) { a(d) += b(d); d += 1 }
              n1(j)(c) += n2(j)(c)
              c += 1
            }
            j += 1
          }
          (s1, n1)
        },
        depth = 2)
      bc.destroy()
      codes = Array.tabulate(m) { j =>
        Array.tabulate(k) { c =>
          if (counts(j)(c) == 0) codes(j)(c)
          else sums(j)(c).map(_ / counts(j)(c))
        }
      }
    }
    Codebook(m, subDim, codes)
  }

  /** Encode a vector column as its m code ids (array<tinyint>): m narrow
    * nearest-centroid expressions over slice()s — fully native, no UDF.
    */
  def encode(vec: Column, cb: Codebook): Column = {
    import graft.functions.GraftFunctions.graft_nearest_centroid
    val v = vec.cast("array<double>")
    array((0 until cb.m).map { j =>
      graft_nearest_centroid(slice(v, j * cb.subDim + 1, cb.subDim),
        typedlit(cb.codes(j).map(_.toSeq).toSeq)).cast("tinyint")
    }: _*)
  }

  /** ADC cosine top-k: encode the corpus once, then score each (query,
    * vector) pair with m table lookups. Queries are collected to the
    * driver to build their dot tables (they are small by contract — the
    * same assumption every broadcast-query ANN path here makes).
    */
  def adcTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, m: Int = 8, kCodes: Int = 16,
      iterations: Int = 3, prefit: Option[Codebook] = None): DataFrame = {
    val spark = corpus.sparkSession
    graft.functions.GraftFunctions.register(spark)
    val cb = prefit.getOrElse(fit(corpus, vecCol, idCol, m, kCodes, iterations))
    val coded = corpus.select(col(idCol).cast("long").as("vid"),
      encode(col(vecCol), cb).as("codes"))
    // query-side tables: dot(q_sub_j, code) per (j, c); code norms are
    // query-independent and ride once as a literal
    val qRows = queries
      .select(col(idCol).cast("long").as("qid"),
        col(vecCol).cast("array<double>").as("qv"))
      .collect()
    require(qRows.nonEmpty, "adcTopK: empty query set")
    val qData = qRows.map { r =>
      val qid = r.getLong(0)
      val qv = r.getSeq[Double](1).toArray
      val qnorm = math.sqrt(qv.map(x => x * x).sum)
      val dot = Array.tabulate(cb.m) { j =>
        val sub = qv.slice(j * cb.subDim, (j + 1) * cb.subDim)
        cb.codes(j).map(code =>
          code.zip(sub).map { case (a, b) => a * b }.sum)
      }
      (qid, qnorm, dot.map(_.toSeq).toSeq)
    }
    import spark.implicits._
    val qDf = qData.toSeq.toDF("qid", "qnorm", "dot")
    val codeNorm2 = typedlit(cb.codes.map(_.map(c => c.map(x => x * x).sum).toSeq).toSeq)
    def lookupSum(table: Column): Column =
      aggregate(zip_with(col("codes"), table,
        (c, row) => element_at(row, (c + lit(1)).cast("int"))),
        lit(0.0d), (acc, x) => acc + x)
    val scored = coded.crossJoin(broadcast(qDf))
      .withColumn("sim", round(
        lookupSum(col("dot")) /
          (greatest(col("qnorm") * sqrt(greatest(lookupSum(codeNorm2), lit(0.0d))),
            lit(1e-12d))), 4))
    Similarity.topKPerQuery(scored, k)
  }
}
