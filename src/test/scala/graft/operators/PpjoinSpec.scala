package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Exact prefix-filtered set-similarity join (Dedup.ppjoinPairs): the
  * operator's whole contract is ZERO false negatives versus brute force,
  * so the spec is set equality of (id1, id2, jaccard) against an all-pairs
  * Jaccard across corpora with planted near-dups, over a threshold grid.
  */
class PpjoinSpec extends SparkSpec {

  // Deterministic corpus: docs over a 12-word vocabulary (dense shingle
  // collisions — the hard case for a token-join), with planted near-dup
  // pairs at several overlap levels plus exact copies and a short (<k
  // tokens) doc exercising the whole-text-shingle branch.
  private def corpus() = {
    import spark.implicits._
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    def words(seed: Int, n: Int): Seq[String] = {
      val rnd = new scala.util.Random(seed) // seeded: deterministic fixture
      (0 until n).map(_ => vocab(rnd.nextInt(vocab.size)))
    }
    val base = (0 until 40).map(i => (i.toLong, words(i, 12 + i % 9).mkString(" ")))
    val copies = (0 until 6).map(i => (100L + i, base(i)._2))              // J = 1
    val nearDups = (0 until 6).map(i => (200L + i, base(i)._2 + " extra")) // high J
    val halves = (0 until 4).map(i =>                                      // mid J
      (300L + i, words(i, 12 + i % 9).take(8).mkString(" ") + " tail tail2"))
    val short = Seq((400L, "tiny doc"), (401L, "tiny doc"))                // < k tokens
    spark.createDataFrame(base ++ copies ++ nearDups ++ halves ++ short)
      .toDF("doc_id", "text")
  }

  private def bruteForce(docs: org.apache.spark.sql.DataFrame, t: Double) = {
    val ids = docs.select(col("doc_id"))
    val pairs = ids.select(col("doc_id").as("id1"))
      .crossJoin(ids.select(col("doc_id").as("id2")))
      .where(col("id1") < col("id2"))
    // reselect explicitly: the second USING join reorders columns (id2 first)
    Dedup.jaccardOfPairs(pairs, docs, "doc_id", "text", shingleK = 3)
      .where(col("jaccard") >= t)
      .select("id1", "id2", "jaccard")
  }

  private def key(r: org.apache.spark.sql.Row) =
    (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 1e9))

  test("ppjoinPairs equals brute force across a threshold grid") {
    val docs = corpus()
    for (t <- Seq(0.5, 0.7, 0.8, 0.95)) {
      val got = Dedup.ppjoinPairs(docs, "doc_id", "text", shingleK = 3,
        threshold = t).collect().map(key).toSet
      val want = bruteForce(docs, t).collect().map(key).toSet
      assert(got === want, s"threshold $t: prefix join diverged from brute force")
      assert(want.nonEmpty, s"threshold $t: degenerate fixture (empty truth)")
    }
  }

  test("exact copies and whole-text-shingle shorts pair at threshold 1.0") {
    val docs = corpus()
    val got = Dedup.ppjoinPairs(docs, "doc_id", "text", shingleK = 3,
      threshold = 1.0)
    // the planted J=1 pairs: 6 copies + the identical short pair; plus any
    // incidental identical texts — brute force is the arbiter
    val want = bruteForce(docs, 1.0).collect().map(key).toSet
    assert(got.collect().map(key).toSet === want)
    assert(want.exists { case (a, b, _) => a == 400L && b == 401L },
      "the <k-token identical pair must survive the whole-text-shingle branch")
  }

  test("sortedIntersectCount merge kernel matches set intersection") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    def arr(xs: Long*) = new GenericArrayData(xs.toArray)
    val f = graft.functions.VectorOps.sortedIntersectCount _
    assert(f(arr(1L, 3L, 5L, 9L), arr(2L, 3L, 9L, 11L)) === 2)
    assert(f(arr(), arr(1L, 2L)) === 0)
    assert(f(arr(4L), arr(4L)) === 1)
    // seeded random sets vs Scala Set intersection
    val rnd = new scala.util.Random(11)
    for (_ <- 0 until 50) {
      val a = Seq.fill(30)(rnd.nextLong() % 100).map(math.abs(_)).distinct.sorted
      val b = Seq.fill(30)(rnd.nextLong() % 100).map(math.abs(_)).distinct.sorted
      assert(f(arr(a: _*), arr(b: _*)) === (a.toSet & b.toSet).size)
    }
  }

  test("crossJaccardJoin equals bipartite brute force across a threshold grid") {
    val docs = corpus()
    // refs drawn FROM the corpus (ids < 10) — the decontamination shape:
    // self pairs (J = 1) must surface, near-dup pairs must surface, and
    // nothing outside brute-force truth may appear
    val refs = docs.where(col("doc_id") < 10)
      .select(col("doc_id").as("ref_id"), col("text").as("ref_text"))
    def cross(t: Double) = {
      val pairs = docs.select(col("doc_id").as("id1"))
        .crossJoin(refs.select(col("ref_id").as("id2")))
      // jaccardOfPairs joins both sides back to one doc table, so stage a
      // union table carrying refs under shifted ids, then shift back
      val shifted = refs.select((col("ref_id") + 10000L).as("doc_id"),
        col("ref_text").as("text"))
      Dedup.jaccardOfPairs(
        pairs.select(col("id1"), (col("id2") + 10000L).as("id2")),
        docs.unionByName(shifted), "doc_id", "text", shingleK = 3)
        .where(col("jaccard") >= t)
        .select(col("id1"), (col("id2") - 10000L).as("id2"), col("jaccard"))
    }
    for (t <- Seq(0.5, 0.8, 1.0)) {
      val got = Dedup.crossJaccardJoin(docs, "doc_id", "text",
        refs, "ref_id", "ref_text", shingleK = 3, threshold = t)
        .collect().map(key).toSet
      val want = cross(t).collect().map(key).toSet
      assert(got === want, s"threshold $t: cross join diverged from brute force")
      assert(want.nonEmpty, s"threshold $t: degenerate fixture (empty truth)")
      // every ref matches itself in the corpus at any threshold
      assert((0L until 10L).forall(i => got.exists {
        case (a, b, j) => a == i && b == i && j == 1000000000L }),
        s"threshold $t: missing a self pair")
    }
  }

  test("crossJaccardJoin on disjoint vocabularies is empty") {
    import spark.implicits._
    val l = Seq((1L, "alpha beta gamma delta"), (2L, "eps zeta eta theta"))
      .toDF("doc_id", "text")
    val r = Seq((7L, "one two three four"), (8L, "five six seven eight"))
      .toDF("rid", "rtext")
    assert(Dedup.crossJaccardJoin(l, "doc_id", "text", r, "rid", "rtext",
      shingleK = 3, threshold = 0.5).count() === 0)
  }

  test("identity collapse: a large exact-copy group is exhaustive and exact") {
    // The frequency-lever shape (r9 verdict #1): g identical docs make
    // every prefix-inverted list quadratic with no filter able to prune —
    // the collapse must emit all C(g,2) pairs at jaccard exactly 1.0 via
    // expansion, plus the cross-group near-dups against EVERY member,
    // while brute force stays the arbiter of the full set.
    import spark.implicits._
    val repeated = (0 until 30).map(i =>
      (500L + i, "alpha beta gamma delta eps zeta eta theta iota"))
    val docs = corpus().unionByName(
      spark.createDataFrame(repeated).toDF("doc_id", "text"))
    val got = Dedup.ppjoinPairs(docs, "doc_id", "text", shingleK = 3,
      threshold = 0.5).collect().map(key).toSet
    val want = bruteForce(docs, 0.5).collect().map(key).toSet
    assert(got === want)
    val withinGroup = got.filter { case (a, b, _) => a >= 500L && b >= 500L }
    assert(withinGroup.size === 30 * 29 / 2, "C(30,2) within-group pairs")
    assert(withinGroup.forall(_._3 === 1000000000L), "within-group J = 1.0")
    // cross-group: refs against the repeated group must hit every member
    val cross = Dedup.crossJaccardJoin(docs, "doc_id", "text",
      docs.where(col("doc_id") === 500L)
        .select(col("doc_id").as("rid"), col("text").as("rtext")),
      "rid", "rtext", shingleK = 3, threshold = 1.0).collect().map(key).toSet
    assert(cross.size === 30 && cross.forall(_._2 == 500L),
      "every member of the collapsed group pairs with the identical ref")
  }

  test("threshold 0 is rejected (degenerate full inverted index)") {
    val docs = corpus()
    intercept[IllegalArgumentException] {
      Dedup.ppjoinPairs(docs, "doc_id", "text", shingleK = 3, threshold = 0.0)
    }
  }
}
