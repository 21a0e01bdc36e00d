package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextEmbedSpec extends SparkSpec {

  test("featureHash is a pure function of content; dims/signs integer-valued") {
    import spark.implicits._
    val df = Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, "gamma beta alpha"), (4L, "delta")).toDF("id", "text")
    val vecs = TextEmbed.featureHash(df, "id", "text", dim = 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(vecs(1L) === vecs(2L), "identical text must embed identically")
    assert(vecs(1L) === vecs(3L), "bag-of-words: order must not matter")
    assert(vecs(1L) !== vecs(4L))
    assert(vecs.values.flatten.forall(v => v == math.rint(v)),
      "pre-normalization coordinates must be integers")
    assert(vecs.values.forall(_.length == 16))
  }

  test("featureHash normalize gives unit vectors, keeps zero vectors zero") {
    import spark.implicits._
    // token "a" repeated: one nonzero coordinate, so the normalized vector
    // has a single +-1; a doc whose tokens all hash-cancel is impossible to
    // construct portably, so the zero-vector guard is exercised via the
    // operator's own when() on an empty-after-filter doc (no row at all) —
    // assert instead that every emitted norm is exactly 1.
    val df = Seq((1L, "a a a"), (2L, "b c d e f g h i")).toDF("id", "text")
    val out = TextEmbed.featureHash(df, "id", "text", dim = 8, normalize = true)
      .select(col("id"), aggregate(col("vec"), lit(0.0), (acc, x) => acc + x * x).as("n2"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out.values.forall(n2 => math.abs(n2 - 1.0) < 1e-9),
      s"non-unit norms: $out")
  }

  test("featureHash is additive over token multisets") {
    import spark.implicits._
    // The hashing trick is linear in the token multiset: vec(A ++ B) ==
    // vec(A) + vec(B) coordinate-wise (pre-normalization) — the property
    // that makes sharded/streaming featurization composable by summing.
    val a = "spark window merge batch"
    val b = "join join agg stream table"
    val df = Seq((1L, a), (2L, b), (3L, s"$a $b")).toDF("id", "text")
    val v = TextEmbed.featureHash(df, "id", "text", dim = 32)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val summed = v(1L).zip(v(2L)).map { case (x, y) => x + y }
    assert(v(3L) === summed, s"additivity broken: ${v(3L)} vs $summed")
  }

  test("featureHash matches a hand-computed coordinate") {
    import spark.implicits._
    // md5("alpha") = 2c1743a391305fbf367df8e4f069f9f9 -> first 7 hex =
    // 0x2c1743a = 46232634; dim 46232634 % 16 = 10; sign hex digit 8 = '3'
    // (odd) -> -1.
    val v = TextEmbed.featureHash(Seq((1L, "alpha")).toDF("id", "text"),
      "id", "text", dim = 16).collect()(0).getSeq[Double](1)
    assert(v(10) === -1.0, s"expected -1 at dim 10, got $v")
    assert(v.map(math.abs).sum === 1.0)
  }
}
