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
    *
    * Assignment metric is squared-L2 per subspace — the construction Jégou
    * TPAMI'11 and FAISS use. Cosine assignment (r6's first cut) discards
    * subvector MAGNITUDE: two subvectors differing only in norm would share
    * a code, leaving the ADC reconstruction error unbounded when energy
    * varies across subspaces. Cosine remains the final full-vector SEARCH
    * metric (adcSim); only the quantizer is Euclidean.
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
            val c = graft.functions.VectorOps.nearestCentroidL2Arr(sub, bc.value(j))
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
    * L2 assignment, matching fit (see fit's scaladoc).
    */
  def encode(vec: Column, cb: Codebook): Column = {
    import graft.functions.GraftFunctions.graft_nearest_centroid_l2
    val v = vec.cast("array<double>")
    array((0 until cb.m).map { j =>
      graft_nearest_centroid_l2(slice(v, j * cb.subDim + 1, cb.subDim),
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
    val qDf = queryTables(queries, idCol, vecCol, cb).drop("qv")
    val scored = coded.crossJoin(broadcast(qDf))
      .withColumn("sim", adcSim(cb))
    Similarity.topKPerQuery(scored, k)
  }

  /** Per-query ADC lookup tables, built once on the driver (queries are
    * small by contract): (qid, qv, qnorm, dot) where dot(j)(c) =
    * <q_sub_j, codebook_j(c)>. Code norms are query-independent and ride
    * separately as a literal (see adcSim).
    */
  private def queryTables(queries: DataFrame, idCol: String, vecCol: String,
      cb: Codebook): DataFrame = {
    val spark = queries.sparkSession
    val qRows = queries
      .select(col(idCol).cast("long").as("qid"),
        col(vecCol).cast("array<double>").as("qv"))
      .collect()
    require(qRows.nonEmpty, "ADC search: empty query set")
    val qData = qRows.map { r =>
      val qid = r.getLong(0)
      val qv = r.getSeq[Double](1).toArray
      val qnorm = math.sqrt(qv.map(x => x * x).sum)
      val dot = Array.tabulate(cb.m) { j =>
        val sub = qv.slice(j * cb.subDim, (j + 1) * cb.subDim)
        cb.codes(j).map(code =>
          code.zip(sub).map { case (a, b) => a * b }.sum)
      }
      (qid, qv.toSeq, qnorm, dot.map(_.toSeq).toSeq)
    }
    import spark.implicits._
    qData.toSeq.toDF("qid", "qv", "qnorm", "dot")
  }

  /** Sum of m table lookups indexed by this row's codes: table is an
    * (m x k) array-of-arrays column (a literal, or element_at of a
    * per-list literal) — the ADC primitive every score below is built from.
    */
  private def lookupSum(table: Column): Column =
    aggregate(zip_with(col("codes"), table,
      (c, row) => element_at(row, (c + lit(1)).cast("int"))),
      lit(0.0d), (acc, x) => acc + x)

  /** ADC cosine score over a frame carrying (codes, dot, qnorm): scoring a
    * corpus vector is m table lookups (zip_with + element_at) instead of d
    * multiplies, and the corpus is never decoded.
    */
  private def adcSim(cb: Codebook): Column = {
    val codeNorm2 = typedlit(cb.codes.map(_.map(c => c.map(x => x * x).sum).toSeq).toSeq)
    round(
      lookupSum(col("dot")) /
        (greatest(col("qnorm") * sqrt(greatest(lookupSum(codeNorm2), lit(0.0d))),
          lit(1e-12d))), 4)
  }

  /** IVF-PQ: the composed billion-vector architecture (FAISS IndexIVFPQ).
    * The coarse quantizer cuts CANDIDATES — each query scores only the
    * nprobe/nlist fraction of the corpus living in its probed inverted
    * lists — and PQ codes cut BYTES per candidate 32x; together a query
    * touches ~nprobe/nlist * 1/32 of the float32 corpus bytes. Both fits
    * are the same zero-corpus-shuffle treeAggregate k-means; search is one
    * broadcast-hash join on cid followed by ADC lookups and the bounded-
    * heap top-k — the corpus is never shuffled, never decoded.
    *
    * By default we encode RAW vectors, not FAISS's per-list residuals:
    * cosine is invariant to per-vector scale, so the ADC table stays
    * query-GLOBAL (m x k) instead of per-(query, list). `residual = true`
    * switches to residual encoding (codes quantize v - centroid(cid), the
    * codebook still SHARED across lists as in FAISS): the query-side table
    * stays global because the per-list part of <q, v> is just the scalar
    * <q, centroid> riding the (nqueries x nprobe) probe table, and the
    * candidate-norm correction terms (<centroid, code>, |centroid|^2) are
    * query-independent (nlist x m x k) literals. Residuals concentrate the
    * codebook on within-list variation — the A/B in PipelineSpec measures
    * the delta at identical bytes: both arms saturate the planted-pair
    * gate at m=8,k=16 (the 0.97-vs-0.3 margin dwarfs either encoding's
    * error), and on exact-top-10 agreement vs brute-force truth at the
    * starved m=4,k=8 budget — where table fidelity binds — residual
    * measures 34/100 vs raw's 31/100 (deterministic fixture). The raw
    * default stands: the delta is small because cosine's scale invariance
    * already removes the magnitude component residuals mostly encode.
    */
  def ivfAdcTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, m: Int = 8, kCodes: Int = 16,
      nlist: Int = 16, nprobe: Int = 4, iterations: Int = 3,
      prefit: Option[Codebook] = None,
      prefitCentroids: Option[Array[Array[Double]]] = None,
      residual: Boolean = false): DataFrame = {
    val spark = corpus.sparkSession
    graft.functions.GraftFunctions.register(spark)
    import graft.functions.GraftFunctions.graft_nearest_centroid
    // One projected, persisted frame feeds the coarse fit, the PQ fit, and
    // the final index build — a single source scan.
    val c = corpus.select(col(idCol).cast("long").as("vid"),
      col(vecCol).cast("array<double>").as("cv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val centroids = prefitCentroids.getOrElse(
        Similarity.fitCentroids(c, nlist, iterations))
      val centLit = typedlit(centroids.map(_.toSeq).toSeq)
      if (!residual) {
        val cb = prefit.getOrElse(fit(c, "cv", "vid", m, kCodes, iterations))
        // index: list id + codes per vector — a narrow projection; this is
        // the whole persisted index (1 int + m bytes per vector).
        val coded = c.select(col("vid"),
          graft_nearest_centroid(col("cv"), centLit).as("cid"),
          encode(col("cv"), cb).as("codes"))
        val qTab = queryTables(queries, idCol, vecCol, cb)
        val probes = Similarity.probeLists(qTab.select("qid", "qv"), centroids, nprobe)
          .select("qid", "cid")
        // (qid, cid, qnorm, dot): nqueries x nprobe rows — broadcast-small.
        val probeTab = probes.join(qTab.drop("qv"), "qid")
        val scored = coded.join(broadcast(probeTab), "cid")
          .withColumn("sim", adcSim(cb))
        Similarity.topKPerQuery(scored, k).localCheckpoint(true)
      } else {
        // Residual path: codes quantize rv = v - centroid(cid). Still a
        // narrow projection over the persisted frame — the residual column
        // never hits a shuffle, and the index stays 1 int + m bytes/vector.
        def dotAgg(a: Column, b: Column): Column =
          aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)
        val assigned = c
          .withColumn("cid", graft_nearest_centroid(col("cv"), centLit))
          .withColumn("rv", zip_with(col("cv"),
            element_at(centLit, col("cid") + lit(1)), (x, cc) => x - cc))
        val cb = prefit.getOrElse(fit(assigned, "rv", "vid", m, kCodes, iterations))
        val coded = assigned.select(col("vid"), col("cid"),
          encode(col("rv"), cb).as("codes"))
        // Query-side tables are built against the residual codebook; the
        // per-list part of <q, v> is the scalar <q, centroid(cid)>, computed
        // once per (query, probed list) on the driver-small probe frame.
        val qTab = queryTables(queries, idCol, vecCol, cb)
        val probes = Similarity.probeLists(qTab.select("qid", "qv"), centroids, nprobe)
          .withColumn("qdotc",
            dotAgg(col("qv"), element_at(centLit, col("cid") + lit(1))))
          .select("qid", "cid", "qdotc")
        val probeTab = probes.join(qTab.drop("qv"), "qid")
        // Query-independent correction literals for |v|^2 = |c + r|^2:
        // |centroid|^2 per list, and <centroid_sub_j, code_j(b)> per
        // (list, subspace, code) — nlist x m x k doubles, a few KB.
        val cnorm2 = typedlit(centroids.map(cc => cc.map(x => x * x).sum).toSeq)
        val cdot = typedlit(centroids.map { cc =>
          (0 until cb.m).map { j =>
            cb.codes(j).map { code =>
              var s = 0.0; var d = 0
              while (d < cb.subDim && j * cb.subDim + d < cc.length) {
                s += code(d) * cc(j * cb.subDim + d); d += 1
              }
              s
            }.toSeq
          }
        }.toSeq)
        val codeNorm2 = typedlit(
          cb.codes.map(_.map(code => code.map(x => x * x).sum).toSeq).toSeq)
        val num = col("qdotc") + lookupSum(col("dot"))
        val vnorm2 = element_at(cnorm2, col("cid") + lit(1)) +
          lit(2.0d) * lookupSum(element_at(cdot, col("cid") + lit(1))) +
          lookupSum(codeNorm2)
        val scored = coded.join(broadcast(probeTab), "cid")
          .withColumn("sim", round(
            num / greatest(col("qnorm") * sqrt(greatest(vnorm2, lit(0.0d))),
              lit(1e-12d)), 4))
        Similarity.topKPerQuery(scored, k).localCheckpoint(true)
      }
    } finally c.unpersist()
  }

  /** Attestation helper: how many (query, candidate) pairs ivfAdcTopK's
    * search scores under this IVF layout. Pass `prefitCentroids` — the SAME
    * fitted array the search used — so the counted layout is the searched
    * layout by construction: fitCentroids' treeAggregate is logically
    * deterministic, but floating-point partial sums combine in shuffle-
    * fetch arrival order, so an independent re-fit can differ in final
    * ulps and flip a near-tie vector's list assignment (r6 advice).
    * Without prefitCentroids this falls back to re-fitting.
    */
  def candidateCount(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, nlist: Int, nprobe: Int, iterations: Int,
      prefitCentroids: Option[Array[Array[Double]]] = None): Long = {
    val spark = corpus.sparkSession
    graft.functions.GraftFunctions.register(spark)
    import graft.functions.GraftFunctions.graft_nearest_centroid
    val c = corpus.select(col(idCol).cast("long").as("vid"),
      col(vecCol).cast("array<double>").as("cv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val centroids = prefitCentroids.getOrElse(
        Similarity.fitCentroids(c, nlist, iterations))
      val assigned = c.select(graft_nearest_centroid(col("cv"),
        typedlit(centroids.map(_.toSeq).toSeq)).as("cid"))
      val q = queries.select(col(idCol).cast("long").as("qid"),
        col(vecCol).cast("array<double>").as("qv"))
      val probes = Similarity.probeLists(q, centroids, nprobe)
        .select("qid", "cid")
      assigned.join(broadcast(probes), "cid").count()
    } finally c.unpersist()
  }
}
