package graft.llm

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads are opaque
  * `binary` columns with typed metadata; decode / feature-extraction
  * runs per-partition in fixed-size batches.
  *
  * IMAGE decode is REAL: [[imageFeatures]] decodes PNG/JPEG/BMP/GIF
  * payloads through JDK ImageIO (no external jars) to width / height /
  * channel count and exact per-channel integer pixel sums — the
  * oracle-checked shape (integer accumulation is order-independent, so
  * the result is bit-deterministic under any partitioning). A payload
  * ImageIO cannot decode yields a null-stats row rather than failing
  * the job (a corrupt image at the 100 TB scale is a data-quality
  * fact, not a crash).
  *
  * AUDIO/VIDEO decode remains an honest STUB (no such codecs in this
  * container): `stubDecodeFeatures` derives a deterministic fake
  * feature vector from the payload bytes, and [[extractFeatures]]
  * records that lane. Everything around both lanes — the schema
  * contract, the binary column, batch shape, partition-parallel
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
    * fixed-size batches within each partition. This is the STUB lane
    * (audio/video — no codecs in this container); images take the real
    * [[imageFeatures]] decode. */
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

  // ------------------------------------------------ real image decode

  /** Deterministic synthetic RGB image: pixel (x, y) of image `id` is
    * r = (id·7 + 3x + 5y) mod 256, g = (id·11 + x + 2y) mod 256,
    * b = (id·13 + 4x + y) mod 256 — closed-form integer arithmetic a
    * SQL oracle replays with generate_series, so a REAL encode→decode
    * round trip is still hash-checkable end to end. */
  def syntheticRgb(id: Long, x: Int, y: Int): (Int, Int, Int) = (
    ((id * 7 + 3L * x + 5L * y) % 256).toInt,
    ((id * 11 + x + 2L * y) % 256).toInt,
    ((id * 13 + 4L * x + y) % 256).toInt)

  /** Encode the synthetic image as PNG bytes via the JDK's own writer
    * (fixtures need no external jar either). */
  def syntheticPng(id: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (r, g, b) = syntheticRgb(id, x, y)
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** [[syntheticPng]] with the GREEN value at pixel (0,0) bumped by
    * +1 (mod 256) — a one-pixel perturbation that leaves the dHash
    * within hamming distance 1 of the base image's, so near-duplicate
    * image pairs exist by construction and the SQL oracle can replay
    * the same closed form. */
  def syntheticPngPerturbed(id: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (r, g0, b) = syntheticRgb(id, x, y)
        val g = if (x == 0 && y == 0) (g0 + 1) % 256 else g0
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Difference hash (dHash) of a decoded image's GREEN channel over
    * the top-left w×h grid: bit (y·(w−1)+x) is set iff
    * g(x+1,y) > g(x,y) — the classic perceptual fingerprint
    * (row-gradient signs), pure integer arithmetic on REAL decoded
    * pixels so near-duplicate detection is exact and replayable by a
    * closed-form SQL oracle. 8×8 grid → 56 bits, safely inside a
    * signed long. None when the payload does not decode. */
  def imageDHash(payload: Array[Byte], w: Int = 8, h: Int = 8): Option[Long] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null || img.getWidth < w || img.getHeight < h) None
      else {
        var hash = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w - 1) {
            val gl = (img.getRGB(x, y) >> 8) & 0xff
            val gr = (img.getRGB(x + 1, y) >> 8) & 0xff
            if (gr > gl) hash |= 1L << (y * (w - 1) + x)
            x += 1
          }
          y += 1
        }
        Some(hash)
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  val imageStatsSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("channels", IntegerType, nullable = true),
    StructField("sum_r", LongType, nullable = true),
    StructField("sum_g", LongType, nullable = true),
    StructField("sum_b", LongType, nullable = true)))

  /** REAL image decode stats: (width, height, color components, exact
    * per-channel sums over the decoded pixels). None when ImageIO has
    * no reader for the bytes (corrupt or non-image payload). */
  def decodeImageStats(payload: Array[Byte]): Option[(Int, Int, Int, Long, Long, Long)] = {
    if (payload == null) return None
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    if (img == null) return None
    val w = img.getWidth
    val h = img.getHeight
    val ch = img.getColorModel.getNumComponents
    // one bulk getRGB per image (row-major ARGB ints), not per pixel
    val px = img.getRGB(0, 0, w, h, null, 0, w)
    var sr = 0L; var sg = 0L; var sb = 0L
    var i = 0
    while (i < px.length) {
      val p = px(i)
      sr += (p >> 16) & 0xff
      sg += (p >> 8) & 0xff
      sb += p & 0xff
      i += 1
    }
    Some((w, h, ch, sr, sg, sb))
  }

  /** Partition-parallel REAL image decode over the binary column (JDK
    * ImageIO): same mapPartitions seam as the stub lane, payloads never
    * shuffle, only (id, stats) leave the stage. Undecodable payloads
    * become null-stats rows — never a job failure. */
  def imageFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("media_id", "payload").rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        decodeImageStats(r.getAs[Array[Byte]](1)) match {
          case Some((w, h, ch, sr, sg, sb)) => Row(id, w, h, ch, sr, sg, sb)
          case None => Row(id, null, null, null, null, null, null)
        }
      }
    }
    spark.createDataFrame(rdd, imageStatsSchema)
  }

  // ------------------------------------------------ real audio decode

  /** Deterministic 16-bit PCM sample: s(id, i) = ((id·31 + i·17) mod
    * 65536) − 32768 — closed-form integer arithmetic a SQL oracle
    * replays, same discipline as [[syntheticRgb]]. */
  def syntheticPcm(id: Long, i: Int): Int =
    (((id * 31 + 17L * i) % 65536) - 32768).toInt

  /** Encode the synthetic signal as a WAV container via the JDK's own
    * javax.sound stack (PCM_SIGNED 16-bit little-endian mono) — audio
    * fixtures need no external jar either. */
  def syntheticWav(id: Long, nSamples: Int, sampleRate: Int = 8000): Array[Byte] = {
    val pcm = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val s = syntheticPcm(id, i)
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
      sampleRate.toFloat, 16, 1, 2, sampleRate.toFloat, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  val audioStatsSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_samples", LongType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("channels", IntegerType, nullable = true),
    StructField("sum_amp", LongType, nullable = true),
    StructField("sum_abs", LongType, nullable = true),
    StructField("max_abs", IntegerType, nullable = true)))

  /** REAL audio decode stats over a WAV payload (JDK javax.sound):
    * sample count, rate, channels, and exact integer amplitude sums —
    * the loudness/clipping signals an audio-corpus filter keys on.
    * Supports the PCM_SIGNED 16-bit frames the container declares
    * (any channel count; frames interleave). None when the bytes are
    * not a decodable audio container or not 16-bit PCM. */
  def decodeAudioStats(payload: Array[Byte]): Option[(Long, Int, Int, Long, Long, Int)] = {
    if (payload == null) return None
    val ais =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => return None
        case _: java.io.IOException => return None
      }
    try {
      val fmt = ais.getFormat
      if (fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
          || fmt.getSampleSizeInBits != 16) return None
      val channels = fmt.getChannels
      val bigEndian = fmt.isBigEndian
      val bytes = ais.readAllBytes()
      val n = bytes.length / 2
      var sum = 0L; var sumAbs = 0L; var maxAbs = 0
      var i = 0
      while (i < n) {
        val lo = bytes(2 * i) & 0xff
        val hi = bytes(2 * i + 1) & 0xff
        val s = (if (bigEndian) (lo << 8) | hi else (hi << 8) | lo).toShort.toInt
        sum += s
        val a = math.abs(s)
        sumAbs += a
        if (a > maxAbs) maxAbs = a
        i += 1
      }
      Some((n.toLong / channels, fmt.getSampleRate.toInt, channels, sum, sumAbs, maxAbs))
    } finally ais.close()
  }

  /** Partition-parallel REAL audio decode — same seam and same
    * null-on-undecodable law as [[imageFeatures]]. */
  def audioFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("media_id", "payload").rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        decodeAudioStats(r.getAs[Array[Byte]](1)) match {
          case Some((ns, sr, ch, sum, sabs, mx)) => Row(id, ns, sr, ch, sum, sabs, mx)
          case None => Row(id, null, null, null, null, null, null)
        }
      }
    }
    spark.createDataFrame(rdd, audioStatsSchema)
  }
}
