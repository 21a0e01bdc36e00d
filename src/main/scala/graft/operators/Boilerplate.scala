package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-document boilerplate paragraph removal — the corpus-cleaning step
  * between exact dedup (whole-document) and near-dup (whole-document
  * similarity): a paragraph that recurs across MANY documents (headers,
  * footers, cookie banners, navigation) is template noise, not content,
  * and web-corpus pipelines strip it at the PARAGRAPH level while keeping
  * the documents (the CCNet / RefinedWeb "remove duplicated paragraphs"
  * pass). None of the existing operators does this: Dedup.* drops whole
  * documents, the span family MEASURES repetition, this one REWRITES the
  * corpus.
  *
  * Scale design (100 TB): explode docs to (doc, idx, para); ONE exchange
  * on the paragraph key computes document frequency (the partial
  * aggregate pre-dedupes (para, doc) map-side, so within-doc repeats
  * never ship); the boilerplate set df > maxDf is then CARDINALITY-
  * BOUNDED BY CONSTRUCTION — sum(df) <= total paragraph occurrences, so
  * |{para : df > maxDf}| <= occurrences / maxDf, which for any
  * corpus-fractional threshold (maxDf = docs/10 here) is <= 10x the
  * paragraphs-per-doc average, a few dozen strings at ANY corpus size —
  * so the probe side anti-joins against it with NO second shuffle of
  * the exploded stream: AQE sees the tiny build side and picks a
  * broadcast anti-join at runtime (declared unhinted — at a degenerate
  * maxDf~1 the set is large and AQE correctly falls back to a shuffle
  * join instead of OOMing a forced broadcast). One exchange back on
  * doc_id reassembles. No collect, no window over the corpus. Paragraph
  * keys are the paragraph STRINGS here (exact semantics, engine-portable
  * for the oracle); a production variant can key on xxhash64(para) to
  * shrink the exchange — same plan shape.
  */
object Boilerplate {

  /** Remove paragraphs appearing in more than `maxDf` distinct documents.
    *
    * Input: (idCol, textCol) with paragraphs delimited by `sep`.
    * Output: (idCol, textCol) — same rows, same ids, paragraphs that
    * survived rejoined by `sep` in original order; a document whose every
    * paragraph was boilerplate survives with empty text (dropping rows is
    * a dedup decision, not a cleaning one).
    */
  def removeParagraphs(docs: DataFrame, idCol: String, textCol: String,
      maxDf: Long, sep: String = "\n\n"): DataFrame = {
    require(maxDf >= 1, s"maxDf must be >= 1, got $maxDf")
    val paras = docs
      .select(col(idCol), posexplode(split(col(textCol),
        java.util.regex.Pattern.quote(sep))).as(Seq("idx", "para")))
    // document frequency per paragraph: distinct docs, not occurrences —
    // a doc repeating its own header should not push it over the line
    val df = paras.groupBy("para")
      .agg(countDistinct(col(idCol)).as("__df"))
    val kept = paras
      .join(df.where(col("__df") > maxDf).select("para"),
        Seq("para"), "left_anti")
    val rebuilt = kept.groupBy(idCol)
      .agg(array_join(transform(array_sort(
        collect_list(struct(col("idx"), col("para")))),
        x => x.getField("para")), sep).as("__clean"))
    // left join: docs that lost every paragraph come back with empty text
    docs.select(col(idCol))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("__clean"), lit("")).as(textCol))
  }

  /** Paragraph document-frequency profile — the diagnostic view a curation
    * run looks at before choosing `maxDf`: one row per distinct paragraph
    * with its df and total occurrence count, heaviest first.
    */
  def paragraphDf(docs: DataFrame, idCol: String, textCol: String,
      sep: String = "\n\n"): DataFrame =
    docs.select(col(idCol),
      explode(split(col(textCol), java.util.regex.Pattern.quote(sep))).as("para"))
      .groupBy("para")
      .agg(countDistinct(col(idCol)).as("df"), count(lit(1)).as("occurrences"))
}
