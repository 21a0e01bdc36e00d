package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque binary columns
  * with typed metadata, processed per-partition in batches.
  *
  * The actual codec step is STUBBED (this container has no image/audio
  * libraries): `fakeDecode` derives deterministic pseudo-features from the
  * bytes. Everything around it — schema, binary column handling, batched
  * per-partition execution, partition sizing — is the real Spark plumbing a
  * production decode (JNI/FFI to a codec, or a Python worker) would use.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata, the schema a 100 TB
    * multimodal corpus table would carry per modality.
    */
  case class MediaRow(doc_id: Long, source: String, mime: String,
      n_bytes: Long, payload: Array[Byte])

  /** Extracted features: fixed-width vector + dimensions, one per media row. */
  case class MediaFeatures(doc_id: Long, source: String, width: Int,
      height: Int, features: Array[Float])

  /** Wrap the documents table's text as a binary payload column — the
    * stand-in for reading real image bytes (binaryFile source at scale).
    */
  def asMediaTable(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
      col("doc_id"),
      col("source"),
      lit("application/octet-stream").as("mime"),
      octet_length(col("text")).cast("long").as("n_bytes"),
      encode(col("text"), "UTF-8").as("payload")).as[MediaRow]
  }

  /** STUB decode: deterministic pseudo-features from payload bytes.
    * A real implementation calls the codec here — per partition, batched,
    * reusing one decoder instance per partition (the expensive init is
    * amortized exactly like a real JNI/ONNX session would be).
    */
  def fakeDecode(payload: Array[Byte]): (Int, Int, Array[Float]) = {
    val h = payload.foldLeft(1469598103934665603L)((acc, b) => (acc ^ b) * 1099511628211L)
    val width = 16 + math.floorMod(h, 16).toInt
    val height = 16 + math.floorMod(h >> 8, 16).toInt
    val features = Array.tabulate(8)(i =>
      math.floorMod(h >> (i * 4), 1000).toFloat / 1000f)
    (width, height, features)
  }

  /** Batched per-partition feature extraction. mapPartitions (not per-row
    * map) so a real decoder is initialized once per partition and rows are
    * processed in a tight loop — the Scala analogue of mapInPandas batches.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // real impl: val decoder = Codec.open(); rows.map{..decoder.decode..}
      rows.map { r =>
        val (w, h, f) = fakeDecode(r.payload)
        MediaFeatures(r.doc_id, r.source, w, h, f)
      }
    }
  }

  /** End-to-end media pipeline: wrap -> batched decode -> per-source rollup. */
  def featureSummary(spark: SparkSession, docs: DataFrame): DataFrame = {
    extractFeatures(asMediaTable(docs))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        round(avg(col("width")), 4).as("avg_width"),
        round(avg(element_at(col("features"), 1)), 4).as("avg_f0"))
      .orderBy("source")
  }
}
