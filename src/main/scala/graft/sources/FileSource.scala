package graft.sources

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

import graft.core.Position

/** File/glob resource: discovery → manifest position → decode
  * (cdf: crates/cdf-source-files/ discovery + manifest positions;
  * format crates cdf-format-{parquet,delimited,json}).
  *
  * Spark-first: decode is `spark.read.{parquet,csv,json}` (vectorized,
  * codec-transparent — gzip/zstd/bzip2/lz4/snappy handled by Hadoop
  * codecs on .gz/.zst/... extensions, covering the reference's
  * decompression transforms). What Spark does NOT give you is the
  * incremental file-manifest position: which files a committed run has
  * already consumed. That lives here, typed, in the ledger.
  */
object FileSource {

  sealed trait Format
  object Format {
    case object Parquet extends Format
    /** bounded-inference delimited decode (cdf: 1k-record inference). */
    final case class Csv(header: Boolean = true, inferRows: Int = 1000) extends Format
    /** NDJSON streaming decode. */
    case object Ndjson extends Format
    /** columnar ORC (vectorized, predicate-pushdown like parquet).
      * Avro/protobuf (cdf-format-{avro,protobuf}) need the spark-avro /
      * spark-protobuf connector jars, absent from this container — the
      * Format seam is where they plug in. */
    case object Orc extends Format
    /** One JSON ARRAY per file (`[{...},{...}]`) — the REST-dump shape.
      * Decoded via Spark's multiLine JSON mode: each file is one unit
      * of parallelism (arrays are not line-splittable — the inherent
      * format trade, recorded; NDJSON is the splittable alternative). */
    case object JsonArray extends Format
    /** XML rows under `rowTag` via Spark 4's built-in XML datasource
      * (spark-xml merged upstream); line-splittable like NDJSON when
      * each row element is self-contained. */
    final case class Xml(rowTag: String = "row") extends Format
    /** Fixed-width (COBOL-copybook-shaped) text: each field is a
      * byte-offset slice of the line, decoded by codegen'd substring +
      * cast + trim — a map-only pass over `spark.read.text` lines, so
      * it splits and scales like any line format. Widths are declared
      * per field in schema order; values are right-padded with spaces
      * (strings) or left-padded (numerics), the classic layout. */
    final case class FixedWidth(widths: Seq[Int]) extends Format
  }

  final case class Discovery(files: Seq[Position.FileEntry])

  /** Glob discovery with (path, size, mtime) identity per file. */
  def discover(dir: String, glob: String = "*"): Discovery = {
    val p = Paths.get(dir)
    if (!Files.exists(p)) return Discovery(Nil)
    val matcher = p.getFileSystem.getPathMatcher(s"glob:$glob")
    val stream = Files.list(p)
    try {
      val entries = scala.jdk.CollectionConverters.IteratorHasAsScala(stream.iterator()).asScala
        .filter(f => Files.isRegularFile(f) && matcher.matches(f.getFileName))
        .map(f => Position.FileEntry(f.toString, Files.size(f),
          Files.getLastModifiedTime(f).toMillis))
        .toVector.sortBy(_.path)
      Discovery(entries)
    } finally stream.close()
  }

  /** New work = discovered − already-committed manifest (a file counts
    * as new if unseen OR grown/modified since). */
  def newFiles(d: Discovery, committed: Option[Position]): Seq[Position.FileEntry] = {
    val seen: Map[String, Position.FileEntry] = committed match {
      case Some(Position.FileManifest(fs)) => fs.map(f => f.path -> f).toMap
      case _ => Map.empty
    }
    d.files.filter(f => seen.get(f.path) match {
      case None => true
      case Some(prev) => prev.size != f.size || prev.mtimeMs != f.mtimeMs
    })
  }

  /** Decode a set of files; schema either declared or bounded-inferred. */
  def read(spark: SparkSession, fmt: Format, files: Seq[String],
      declared: Option[StructType] = None): DataFrame = {
    require(files.nonEmpty, "no files to read")
    fmt match {
      case Format.Parquet => spark.read.parquet(files: _*)
      case Format.Csv(header, inferRows) =>
        val r = spark.read.option("header", header.toString)
        declared match {
          case Some(s) => r.schema(s).csv(files: _*)
          case None =>
            // bounded inference: sample schema from a limited read, then
            // bind it for the full scan (mirrors the reference's 1k-record
            // inference; avoids an unbounded double pass at scale)
            val sampled = r.option("inferSchema", "true")
              .csv(files.head).limit(inferRows)
            spark.read.option("header", header.toString)
              .schema(sampled.schema).csv(files: _*)
        }
      case Format.Ndjson =>
        declared match {
          case Some(s) => spark.read.schema(s).json(files: _*)
          case None => spark.read.json(files: _*)
        }
      case Format.Orc => spark.read.orc(files: _*)
      case Format.JsonArray =>
        val r = spark.read.option("multiLine", "true")
        declared match {
          case Some(s) => r.schema(s).json(files: _*)
          case None => r.json(files: _*)
        }
      case Format.Xml(rowTag) =>
        val r = spark.read.format("xml").option("rowTag", rowTag)
        declared match {
          case Some(s) => r.schema(s).load(files: _*)
          case None => r.load(files: _*)
        }
      case Format.FixedWidth(widths) =>
        val s = declared.getOrElse(throw new IllegalArgumentException(
          "FixedWidth requires a declared schema (one width per field)"))
        require(widths.length == s.fields.length,
          s"FixedWidth: ${widths.length} widths for ${s.fields.length} fields")
        import org.apache.spark.sql.functions.{col, substring, trim}
        val lines = spark.read.text(files: _*)
        val offsets = widths.scanLeft(1)(_ + _)
        val cols = s.fields.zip(widths).zip(offsets).map { case ((f, w), off) =>
          // trim both pad directions, then cast through Spark's string
          // coercion — empty slice ⇒ null (the fixed-width NULL idiom)
          val raw = trim(substring(col("value"), off, w))
          org.apache.spark.sql.functions
            .when(raw === "", null).otherwise(raw)
            .cast(f.dataType).as(f.name)
        }
        lines.select(cols.toSeq: _*)
    }
  }

  /** Post-run position: previous manifest ∪ consumed files. */
  def advance(committed: Option[Position], consumed: Seq[Position.FileEntry]): Position = {
    val base = committed match {
      case Some(m: Position.FileManifest) => m
      case _ => Position.FileManifest(Nil)
    }
    Position.merge(base, Position.FileManifest(consumed))
  }
}
