package graft.llm

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads are opaque
  * `binary` columns with typed metadata; decode / feature-extraction
  * runs per-partition in fixed-size batches.
  *
  * The decode step itself is a STUB (no image/audio codecs in this
  * container): `stubDecodeFeatures` derives a deterministic fake
  * feature vector from the payload bytes. Everything around it — the
  * schema contract, the binary column, batch shape, partition-parallel
  * execution via `mapPartitions` (the Scala analogue of
  * `mapInPandas`), and the metadata projection — is real and tested.
  *
  * Scale: payloads never pass through a shuffle; metadata extraction
  * and feature extraction are narrow map stages, and downstream joins
  * use only (id, features).
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("media_type", StringType, nullable = false)))

  /** Wrap any text column as an opaque binary payload — the testdata
    * carrier for the multimodal path. */
  def asMedia(df: DataFrame, idCol: String, textCol: String, mediaType: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(textCol).cast("binary").as("payload"),
      lit(mediaType).as("media_type"))

  /** Typed metadata projection — pure Column expressions. */
  def metadata(media: DataFrame): DataFrame =
    media.select(
      col("media_id"),
      col("media_type"),
      length(col("payload")).as("byte_len"),
      sha2(col("payload"), 256).as("payload_sha256"))

  val FeatureDim = 8

  /** STUB decode: a real implementation would decode the image/audio
    * payload here (per-partition, batched). The fake is a deterministic
    * byte-fold so tests exercise the full distributed path. Bytes
    * accumulate as EXACT integers with one normalizing division at the
    * end — bit-deterministic regardless of accumulation order, so the
    * result is oracle-comparable (never sum raw doubles). */
  private def stubDecodeFeatures(payload: Array[Byte]): Array[Double] = {
    val acc = new Array[Long](FeatureDim)
    if (payload != null) {
      var i = 0
      while (i < payload.length) {
        acc(i % FeatureDim) += (payload(i) & 0xff)
        i += 1
      }
    }
    acc.map(_ / 255.0)
  }

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("features", ArrayType(DoubleType, containsNull = false), nullable = false)))

  /** Decoder batch size: codecs amortize model/codec setup per batch,
    * exactly like `mapInPandas` receives Arrow batches. */
  val DecodeBatchSize = 64

  /** Batch decode seam: a real codec implementation replaces this with
    * one that decodes `batch` payloads together (GPU/process reuse). */
  private def decodeBatch(batch: Seq[(Long, Array[Byte])]): Seq[(Long, Array[Double])] =
    batch.map { case (id, payload) => (id, stubDecodeFeatures(payload)) }

  /** Partition-parallel feature extraction over the binary column —
    * the `mapInPandas`-shaped seam: payloads flow to the decoder in
    * fixed-size batches within each partition. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("media_id", "payload").rdd.mapPartitions { it =>
      it.map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
        .grouped(DecodeBatchSize)
        .flatMap(decodeBatch)
        .map { case (id, f) => Row(id, f.toSeq) }
    }
    spark.createDataFrame(rdd, featureSchema)
  }
}
