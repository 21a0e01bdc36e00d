package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** PCA over an embedding column — the classic preprocessing step the
  * vector toolkit was missing next to random projection (data-blind),
  * PQ (codebooks) and IVF (coarse buckets): center, find the top-k
  * variance directions, project. Whitening embeddings before
  * quantization/indexing concentrates energy in few dimensions and is
  * standard prep for OPQ-style codebooks.
  *
  * Scale shape: ONE treeAggregate pass accumulates (n, sum, X^T X) —
  * driver state is dim + dim^2 doubles (64 -> 33 KB), never rows; the
  * eigendecomposition runs on the driver (cyclic Jacobi on a dim x dim
  * symmetric matrix — microseconds at embedding dims); the projection is
  * a broadcast-components narrow map. No shuffle anywhere.
  *
  * Float caveat: the Gram accumulation order follows partitioning, so
  * component values are reproducible only to float-sum stability —
  * callers gate on INVARIANTS (orthonormality, eigenvalue descent,
  * trace identity, per-component projected variance == eigenvalue), not
  * on component bytes.
  */
object Pca {

  /** (eigenvalues desc, components row-major [k x dim], n) from one pass. */
  def fit(df: DataFrame, vecCol: String, k: Int): (Array[Double], Array[Array[Double]], Long) = {
    val dim = df.select(size(col(vecCol))).first().getInt(0)
    require(k >= 1 && k <= dim, s"k ($k) must be in [1, $dim]")
    val zero = (0L, new Array[Double](dim), new Array[Double](dim * dim))
    val (n, s, g) = df.select(col(vecCol).cast("array<double>"))
      .rdd.map(_.getSeq[Double](0).toArray)
      .treeAggregate(zero)(
        seqOp = { case ((n0, s0, g0), x) =>
          // a clear error beats the ArrayIndexOutOfBounds a ragged corpus
          // would otherwise throw from deep inside the fold
          require(x.length == dim,
            s"PCA input has mixed dimensions: saw ${x.length}, expected $dim")
          var i = 0
          while (i < dim) {
            s0(i) += x(i)
            var j = i
            while (j < dim) { g0(i * dim + j) += x(i) * x(j); j += 1 }
            i += 1
          }
          (n0 + 1, s0, g0)
        },
        combOp = { case ((n1, s1, g1), (n2, s2, g2)) =>
          var i = 0
          while (i < dim) { s1(i) += s2(i); i += 1 }
          i = 0
          while (i < dim * dim) { g1(i) += g2(i); i += 1 }
          (n1 + n2, s1, g1)
        })
    require(n > 1, s"PCA needs > 1 row, got $n")
    // covariance C = G/n - mu mu^T (population form), symmetrized
    val c = Array.ofDim[Double](dim, dim)
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val v = g(i * dim + j) / n - (s(i) / n) * (s(j) / n)
        c(i)(j) = v; c(j)(i) = v
        j += 1
      }
      i += 1
    }
    val (values, vectors) = jacobiEigen(c)
    (values.take(k), vectors.take(k), n)
  }

  /** Project vecCol onto the (broadcast) components: adds `proj`
    * (array<double> of length components.length).
    */
  def project(df: DataFrame, vecCol: String,
      components: Array[Array[Double]]): DataFrame = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(components)
    val f = udf { (v: Seq[Double]) =>
      val comps = bc.value
      val out = new Array[Double](comps.length)
      var c = 0
      while (c < comps.length) {
        val row = comps(c)
        var d = 0; var acc = 0.0
        while (d < row.length) { acc += row(d) * v(d); d += 1 }
        out(c) = acc
        c += 1
      }
      out
    }
    df.withColumn("proj", f(col(vecCol).cast("array<double>")))
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: returns
    * (eigenvalues desc, eigenvectors as rows, matched order). Textbook
    * rotations (Golub & Van Loan §8.5); plenty for embedding dims.
    */
  private[operators] def jacobiEigen(a0: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val n = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    while (off > 1e-12 && sweep < 64) {
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          if (math.abs(a(p)(q)) > 1e-15) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            val t = math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val cos = 1.0 / math.sqrt(t * t + 1.0)
            val sin = t * cos
            var i = 0
            while (i < n) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = cos * aip - sin * aiq
              a(i)(q) = sin * aip + cos * aiq
              i += 1
            }
            i = 0
            while (i < n) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = cos * api - sin * aqi
              a(q)(i) = sin * api + cos * aqi
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = cos * vip - sin * viq
              v(i)(q) = sin * vip + cos * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    val order = (0 until n).sortBy(i => -a(i)(i))
    (order.map(i => a(i)(i)).toArray,
      order.map(i => (0 until n).map(r => v(r)(i)).toArray).toArray)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = i + 1
      while (j < a.length) { s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    math.sqrt(s)
  }
}
