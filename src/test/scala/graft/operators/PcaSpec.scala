package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PcaSpec extends SparkSpec {

  import spark.implicits._

  test("jacobi recovers a known spectrum") {
    // diag(5, 2, 1) rotated by a known orthonormal basis
    val d = Array(5.0, 2.0, 1.0)
    val theta = 0.7
    val r = Array(
      Array(math.cos(theta), -math.sin(theta), 0.0),
      Array(math.sin(theta), math.cos(theta), 0.0),
      Array(0.0, 0.0, 1.0))
    val m = Array.tabulate(3, 3)((i, j) =>
      (0 until 3).map(k => r(i)(k) * d(k) * r(j)(k)).sum)
    val (values, vectors) = Pca.jacobiEigen(m)
    assert(values.zip(Seq(5.0, 2.0, 1.0)).forall { case (a, b) => math.abs(a - b) < 1e-9 })
    // eigenvectors orthonormal
    for (a <- 0 until 3; b <- 0 until 3) {
      val dot = (0 until 3).map(k => vectors(a)(k) * vectors(b)(k)).sum
      assert(math.abs(dot - (if (a == b) 1.0 else 0.0)) < 1e-9)
    }
  }

  test("fit on anisotropic gaussian finds the stretched axis first") {
    val rnd = new scala.util.Random(5)
    // x-axis stddev 10, y 1, z 0.1, then rotated into a 4d space
    val rows = Seq.fill(4000) {
      val x = rnd.nextGaussian() * 10
      val y = rnd.nextGaussian() * 1
      val z = rnd.nextGaussian() * 0.1
      Seq(0.6 * x + 0.8 * y, -0.8 * x + 0.6 * y, z, 0.0)
    }
    val df = rows.toDF("v")
    val (values, comps, n) = Pca.fit(df, "v", 3)
    assert(n === 4000L)
    assert(values(0) > 50 && values(0) < 150) // ~100
    assert(values(1) > 0.5 && values(1) < 2.0) // ~1
    assert(values(0) > values(1) && values(1) > values(2))
    // top component aligns with the stretched direction (0.6, -0.8, 0, 0)
    val align = math.abs(0.6 * comps(0)(0) - 0.8 * comps(0)(1))
    assert(align > 0.99, s"top component misaligned: $align")
    // projected variance along component 0 equals eigenvalue 0
    val proj = Pca.project(df, "v", comps)
    val stats = proj.select(col("proj")(0).as("z"))
      .agg(avg("z"), avg(col("z") * col("z"))).first()
    val varZ = stats.getDouble(1) - stats.getDouble(0) * stats.getDouble(0)
    assert(math.abs(varZ - values(0)) / values(0) < 1e-6,
      s"projected variance $varZ != eigenvalue ${values(0)}")
  }

  test("trace identity: eigenvalues sum to total variance") {
    val rnd = new scala.util.Random(9)
    val df = Seq.fill(1000)(Seq.fill(6)(rnd.nextGaussian())).toDF("v")
    val (values, _, _) = Pca.fit(df, "v", 6)
    // total variance computed independently per coordinate
    val cols = (0 until 6).map(i => col("v")(i))
    val r = df.agg(
      cols.map(c => (avg(c * c) - avg(c) * avg(c)).as(s"x")).reduce(_ + _)
    ).first().getDouble(0)
    assert(math.abs(values.sum - r) / r < 1e-9)
  }
}
