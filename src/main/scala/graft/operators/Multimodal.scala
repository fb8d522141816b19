package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media payloads are opaque `binary` columns
  * with a typed metadata struct; decode / feature-extraction runs as a
  * partition-local batch transform (the Scala analog of a Pandas-UDF
  * `mapInPandas` stage — executors stream batches through the decoder, no
  * driver involvement, arbitrary native libs could be called inside).
  *
  * The actual image/audio codec is STUBBED (no media libraries in this
  * environment): `decodeFeatures` derives deterministic fake features from
  * the raw bytes. The Spark-side contract — schema, batching, partitioning,
  * null handling — is real and tested.
  */
object Multimodal {

  final case class MediaRecord(doc_id: Long, mime: String, payload: Array[Byte])
  final case class MediaFeatures(
      doc_id: Long, byte_len: Int, n_frames: Int,
      brightness: Double, histogram: Array[Long])

  /** Wrap a text corpus as opaque media payloads with typed metadata. */
  def toMediaFrame(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(
      col(idCol).cast(LongType).as("doc_id"),
      lit("application/octet-stream").as("mime"),
      encode(col(textCol), "UTF-8").as("payload"))

  /** STUB decoder — stands in for e.g. JPEG decode + resize + frame-sample.
    * Deterministic features from the payload bytes; the real
    * implementation would swap only this function body.
    */
  def decodeStub(r: MediaRecord): MediaFeatures = {
    val bytes = if (r.payload == null) Array.emptyByteArray else r.payload
    val hist = new Array[Long](4)
    var sum = 0L
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      hist(b >>> 6) += 1
      sum += b
      i += 1
    }
    MediaFeatures(
      doc_id = r.doc_id,
      byte_len = bytes.length,
      n_frames = bytes.length / 256,
      brightness = if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length,
      histogram = hist)
  }

  /** Partition-local batch feature extraction (mapPartitions = the batched
    * UDF boundary; one decoder instance per task, streaming).
    */
  def decodeFeatures(media: Dataset[MediaRecord])(implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions(_.map(decodeStub))
  }
}
