package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Feature-hashing text embedder — the "hashing trick" (Weinberger et al.,
  * ICML'09, arXiv:0902.2206): token t contributes sign(h2(t)) to dimension
  * h1(t) mod D, giving every document a dense D-dim vector with NO
  * trained model and NO vocabulary table. This is the bridge from the
  * documents table to the ANN/dedup family when model embeddings are
  * absent (or as the cheap first-pass filter before them): sign-hashing
  * makes the map an unbiased inner-product sketch, so cosine over these
  * vectors approximates token-multiset similarity.
  *
  * Engine-portable by construction: h1/h2 are md5 hex spans (dimension =
  * first 7 hex digits mod D, sign = parity of hex digit 8), so an oracle
  * can re-derive every coordinate exactly — pre-normalization vectors are
  * integer-valued.
  *
  * Scale: one explode + one (id, dim) groupBy + one per-doc assembly
  * groupBy — two shuffles, both linear in token count; no vocabulary
  * state, no broadcast, nothing corpus-global. The D-wide dense assembly
  * is a per-row transform over a map literal-sized at D entries.
  */
object TextEmbed {

  /** (id, vec: array<double>) — signed-count vectors, L2-normalized when
    * `normalize` (all-zero vectors stay zero rather than NaN). Every id in
    * `df` gets a row: documents whose text tokenizes to nothing (empty or
    * whitespace-only) embed as the zero vector rather than silently
    * vanishing — downstream exact-count contracts (x_embed_dedup's
    * n_expected == n_found over identical-text groups) assume the id
    * universe is preserved.
    */
  def featureHash(df: DataFrame, idCol: String, textCol: String,
      dim: Int = 64, normalize: Boolean = false): DataFrame = {
    require(dim > 0 && dim <= 4096, s"dim $dim out of range")
    val digest = md5(col("t").cast("binary"))
    val tb = df.select(col(idCol).cast("long").as("id"),
      explode(split(lower(col(textCol)), " ")).as("t"))
      .where(col("t") =!= "")
      .select(col("id"),
        pmod(conv(substring(digest, 1, 7), 16, 10).cast("long"), lit(dim.toLong))
          .as("d"),
        (lit(1L) - lit(2L) * pmod(conv(substring(digest, 8, 1), 16, 10)
          .cast("long"), lit(2L))).as("s"))
    // ONE shuffle, not two: pivot over the (known, small) dimension domain
    // turns the token-level (id, d, s) stream into a per-doc wide row in a
    // single partial-aggregated exchange — the previous groupBy(id,d) ->
    // groupBy(id) shape shuffled the token stream twice and carried a
    // map_from_entries per doc. Map-side partial aggregation compresses
    // the ~100-tokens/doc stream to <= dim cells per (doc, map task)
    // before anything rides the wire.
    val dense0 = tb.groupBy("id")
      .pivot("d", (0L until dim.toLong).map(_.asInstanceOf[Any]))
      .agg(sum("s"))
      .select(col("id"),
        array((0 until dim).map(i =>
          coalesce(col(s"$i"), lit(0L)).cast("double")): _*).as("vec"))
    val dense = df.select(col(idCol).cast("long").as("id")).distinct()
      .join(dense0, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("vec"), array_repeat(lit(0.0), lit(dim))).as("vec"))
    if (!normalize) dense
    else dense
      .withColumn("__n", sqrt(aggregate(col("vec"), lit(0.0),
        (acc, x) => acc + x * x)))
      .select(col("id"),
        when(col("__n") === 0.0, col("vec"))
          .otherwise(transform(col("vec"), x => x / col("__n"))).as("vec"))
  }
}
