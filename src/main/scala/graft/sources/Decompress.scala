package graft.sources

import org.apache.commons.compress.compressors.CompressorStreamFactory
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Decompression transforms in the decode pipeline (cdf:
  * crates/cdf-transform-{gzip,zstd,bzip2,xz}/, SURVEY §2.1).
  *
  * Hadoop's line reader already handles .gz/.bz2 transparently in
  * `spark.read.csv/json`; this path exists for codecs Hadoop does NOT
  * wire in (xz, and zstd-on-text), and mirrors the reference's
  * transform-before-decode composition: binary file → decompressor
  * stream → line split → format decode. One task per compressed file
  * (these codecs are not splittable — same constraint the reference
  * has), so at scale many medium files beat one giant archive.
  */
object Decompress {

  /** codec ∈ {"gz","bzip2","xz","zstd"} (CompressorStreamFactory names). */
  def lines(spark: SparkSession, pathGlob: String, codec: String): Dataset[String] = {
    import spark.implicits._
    spark.sparkContext.binaryFiles(pathGlob).flatMap { case (_, pds) =>
      val raw = new java.io.BufferedInputStream(pds.open())
      val in = new CompressorStreamFactory().createCompressorInputStream(codec, raw)
      val reader = new java.io.BufferedReader(
        new java.io.InputStreamReader(in, java.nio.charset.StandardCharsets.UTF_8))
      new Iterator[String] {
        private var line = reader.readLine()
        def hasNext: Boolean = { val h = line != null; if (!h) reader.close(); h }
        def next(): String = { val l = line; line = reader.readLine(); l }
      }
    }.toDS()
  }

  /** Decompress + CSV decode (header row respected via the format). */
  def csv(spark: SparkSession, pathGlob: String, codec: String,
      header: Boolean = true): DataFrame =
    spark.read.option("header", header.toString).option("inferSchema", "true")
      .csv(lines(spark, pathGlob, codec))

  /** Decompress + NDJSON decode. */
  def ndjson(spark: SparkSession, pathGlob: String, codec: String): DataFrame =
    spark.read.json(lines(spark, pathGlob, codec))

  /** Compress a local file with `codec` (test/fixture helper — the
    * write path; executors use the same streams). */
  def compressFile(src: String, dst: String, codec: String): Unit = {
    val in = new java.io.FileInputStream(src)
    val out = new CompressorStreamFactory().createCompressorOutputStream(codec,
      new java.io.BufferedOutputStream(new java.io.FileOutputStream(dst)))
    val buf = new Array[Byte](64 * 1024)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    in.close(); out.close()
  }
}
