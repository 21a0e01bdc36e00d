package graft.operators

import graft.SparkSpec

/** BPE merge training against the hand-computed merges of the classic
  * Sennrich et al. corpus {low:5, lower:2, newest:6, widest:3}:
  *   pairs round 1: (e,s)=9 and (s,t)=9 tie -> lexicographic (e,s);
  *   round 2: (es,t)=9; round 3: (l,o)=7 and (o,w)=7 tie -> (l,o).
  */
class BpeSpec extends SparkSpec {

  test("applyMerge is left-to-right non-overlapping") {
    assert(Bpe.applyMerge(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
    assert(Bpe.applyMerge(Seq("a", "a", "a", "a"), "a", "a") == Seq("aa", "aa"))
    assert(Bpe.applyMerge(Seq("x", "y"), "a", "b") == Seq("x", "y"))
    assert(Bpe.applyMerge(Seq("a", "b", "c", "a", "b"), "a", "b")
      == Seq("ab", "c", "ab"))
  }

  test("trains the textbook merges on the Sennrich corpus, losslessly") {
    import spark.implicits._
    val words = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L)).toDS()
    val (merges, vocab) = Bpe.train(spark, words, 3)
    assert(merges.map(m => (m.left, m.right, m.weight))
      == Seq(("e", "s", 9L), ("es", "t", 9L), ("l", "o", 7L)))
    val out = vocab.collect().map(w => w.word -> w.syms).toMap
    vocab.unpersist()
    assert(out("newest") == Seq("n", "e", "w", "est"))
    assert(out("widest") == Seq("w", "i", "d", "est"))
    assert(out("low") == Seq("lo", "w"))
    assert(out("lower") == Seq("lo", "w", "e", "r"))
    assert(out.forall { case (w, syms) => syms.mkString == w })
  }

  test("symbolizes on codepoints: a supplementary-plane char is ONE symbol") {
    // U+1F600 is a surrogate PAIR in UTF-16 but one character to DuckDB's
    // substr — per-code-unit symbolization would diverge from the oracle
    val emoji = new String(Character.toChars(0x1F600))
    assert(Bpe.symbolize(s"a${emoji}b") == Seq("a", emoji, "b"))
    assert(Bpe.symbolize(emoji * 2) == Seq(emoji, emoji))
    import spark.implicits._
    val words = Seq((s"$emoji$emoji", 3L)).toDS()
    val (merges, vocab) = Bpe.train(spark, words, 1)
    vocab.unpersist()
    // the learned merge is (emoji, emoji), not a half-surrogate pair
    assert(merges.map(m => (m.left, m.right, m.weight)) == Seq((emoji, emoji, 3L)))
  }

  test("encode applies frozen merges by priority rank to unseen words") {
    val merges = Seq(Bpe.Merge("e", "s", 9), Bpe.Merge("es", "t", 9),
      Bpe.Merge("l", "o", 7))
    // "lowest" was never in the training corpus; the textbook merges
    // still tokenize it as lo|w|est (priority = training rank)
    assert(Bpe.encode("lowest", merges) == Seq("lo", "w", "est"))
    // no applicable merge -> plain codepoint symbolization
    assert(Bpe.encode("xyz", merges) == Seq("x", "y", "z"))
    assert(Bpe.encode("", merges) == Seq.empty)
    // partial application: (e,s) fires, (es,t) can't (no trailing t)
    assert(Bpe.encode("les", merges) == Seq("l", "es"))
    // every output symbol is a single codepoint or a trained merge concat
    val allowed = merges.map(m => m.left + m.right).toSet
    for (w <- Seq("lowest", "wilder", "estes"))
      assert(Bpe.encode(w, merges).forall(s =>
        s.codePointCount(0, s.length) == 1 || allowed.contains(s)))
  }

  test("encode iterates to fixpoint on symbol-aliasing merge tables") {
    // ("a","b")'s output makes rank-0 ("ab","c") newly applicable — a
    // single in-order replay would stop at [ab, c]; the standard
    // rank-iterative rule (Sennrich apply_bpe / HuggingFace) reaches [abc]
    val aliasing = Seq(Bpe.Merge("ab", "c", 5), Bpe.Merge("a", "b", 9))
    assert(Bpe.encode("abc", aliasing) == Seq("abc"))
    // duplicate pair entries: the earliest rank wins (deterministic)
    val dup = Seq(Bpe.Merge("a", "b", 9), Bpe.Merge("a", "b", 3))
    assert(Bpe.encode("ab", dup) == Seq("ab"))
    // fixpoint still lossless on repeated structure
    assert(Bpe.encode("abcabc", aliasing).mkString == "abcabc")
  }

  test("stops early when no pair remains") {
    import spark.implicits._
    val words = Seq(("ab", 4L)).toDS()
    val (merges, vocab) = Bpe.train(spark, words, 5)
    vocab.unpersist()
    assert(merges.map(m => (m.left, m.right, m.weight)) == Seq(("a", "b", 4L)))
  }
}
