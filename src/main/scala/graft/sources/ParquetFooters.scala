package graft.sources

import java.time.LocalDate

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.{LogicalTypeAnnotation, PrimitiveType}
import org.apache.spark.sql.SparkSession

/** Metadata-only parquet statistics: per-file row counts and per-column
  * min/max/null-count read from the FOOTER — never a data page. This is
  * how commit-time stats must be collected at 100 TB: the reference's
  * writers record file statistics during the write
  * (crates/cdf-engine/src/statistics_pruning.rs:27-160 consumes them);
  * a second full scan of just-written data doubles commit I/O.
  *
  * Bounds are extracted only for types whose parquet min/max are SOUND
  * for Spark-semantics pruning:
  *  - INT32 / INT64 (plain or signed-int annotated) → Int / Long
  *  - BINARY + string annotation → String (parquet orders binary stats
  *    by unsigned byte, which equals UTF-8 code-point order — the same
  *    order [[IcebergSource.cmpValues]] uses)
  *  - BOOLEAN → Boolean
  *  - INT32 + date annotation → LocalDate
  *  - DECIMAL over INT32 / INT64 / FLBA / BINARY → java.math.BigDecimal
  *    (unscaled + the annotation's scale). Sound: parquet's defined
  *    sort order for DECIMAL is SIGNED numeric order, and parquet-mr
  *    refuses to surface binary decimal stats from legacy writers whose
  *    stats were unsigned-byte-ordered (`shouldIgnoreStatistics`), so
  *    any stats we are handed compare the way Spark compares decimals.
  *  - INT64 TIMESTAMP (MICROS / MILLIS) → java.time.Instant when
  *    UTC-adjusted, java.time.LocalDateTime (wall-clock) when not —
  *    the two are distinct bound domains and never compare across.
  *    NANOS is skipped: converting a max to micros truncates DOWN,
  *    which is unsound for an upper bound.
  * FLOAT/DOUBLE are deliberately EXCLUDED: parquet writers drop NaN
  * from min/max, but Spark orders NaN above every value, so a file of
  * [1.0, 5.0] hiding NaNs would be wrongly pruned by `c > 1e9`.
  * INT96 timestamps carry no usable stats; nested columns are skipped
  * (absent bounds only cost pruning, never rows).
  */
object ParquetFooters {

  /** One column's file-level stats. `lower`/`upper` are None when any
    * row group lacks stats for the column (conservative: no bounds).
    * `nullCount` is None unless every row group recorded one. */
  final case class ColStats(lower: Option[Any], upper: Option[Any],
      nullCount: Option[Long]) extends Serializable

  final case class FileStats(path: String, rowCount: Long, sizeBytes: Long,
      cols: Map[String, ColStats]) extends Serializable

  /** Same-type ordering used to merge row-group stats; mirrors the
    * sound subset of [[IcebergSource.cmpValues]]. */
  private[sources] def cmpSame(a: Any, b: Any): Int = (a, b) match {
    case (x: Int, y: Int) => Integer.compare(x, y)
    case (x: Long, y: Long) => java.lang.Long.compare(x, y)
    case (x: Boolean, y: Boolean) => java.lang.Boolean.compare(x, y)
    case (x: LocalDate, y: LocalDate) => java.lang.Long.compare(x.toEpochDay, y.toEpochDay)
    case (x: java.math.BigDecimal, y: java.math.BigDecimal) => x.compareTo(y)
    case (x: java.time.Instant, y: java.time.Instant) => x.compareTo(y)
    case (x: java.time.LocalDateTime, y: java.time.LocalDateTime) => x.compareTo(y)
    case (x: String, y: String) =>
      var i = 0; var j = 0
      while (i < x.length && j < y.length) {
        val ca = x.codePointAt(i); val cb = y.codePointAt(j)
        if (ca != cb) return Integer.compare(ca, cb)
        i += Character.charCount(ca); j += Character.charCount(cb)
      }
      Integer.compare(x.length - i, y.length - j)
    case other => throw new IllegalArgumentException(s"cmpSame over mixed types: $other")
  }

  /** Convert one parquet statistics value to the bound domain, or None
    * for types whose stats cannot prune soundly. */
  private def boundValue(pt: PrimitiveType, v: AnyRef): Option[Any] = {
    import PrimitiveType.PrimitiveTypeName._
    val ann = pt.getLogicalTypeAnnotation
    (pt.getPrimitiveTypeName, ann) match {
      case (INT32, d: LogicalTypeAnnotation.DateLogicalTypeAnnotation) =>
        val _ = d
        Some(LocalDate.ofEpochDay(v.asInstanceOf[java.lang.Integer].longValue()))
      case (INT32, null) => Some(v.asInstanceOf[java.lang.Integer].intValue())
      case (INT32, i: LogicalTypeAnnotation.IntLogicalTypeAnnotation) if i.isSigned =>
        Some(v.asInstanceOf[java.lang.Integer].intValue())
      case (INT64, null) => Some(v.asInstanceOf[java.lang.Long].longValue())
      case (INT64, i: LogicalTypeAnnotation.IntLogicalTypeAnnotation) if i.isSigned =>
        Some(v.asInstanceOf[java.lang.Long].longValue())
      case (BOOLEAN, _) => Some(v.asInstanceOf[java.lang.Boolean].booleanValue())
      case (BINARY, _: LogicalTypeAnnotation.StringLogicalTypeAnnotation) =>
        Some(v.asInstanceOf[org.apache.parquet.io.api.Binary].toStringUsingUTF8)
      case (INT32, dec: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation) =>
        Some(java.math.BigDecimal.valueOf(
          v.asInstanceOf[java.lang.Integer].longValue(), dec.getScale))
      case (INT64, dec: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation) =>
        Some(java.math.BigDecimal.valueOf(
          v.asInstanceOf[java.lang.Long].longValue(), dec.getScale))
      case (FIXED_LEN_BYTE_ARRAY | BINARY, dec: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation) =>
        // unscaled two's-complement big-endian bytes (parquet's layout
        // for binary-backed decimals; same layout Iceberg bounds use)
        Some(new java.math.BigDecimal(
          new java.math.BigInteger(v.asInstanceOf[org.apache.parquet.io.api.Binary].getBytes),
          dec.getScale))
      case (INT64, ts: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation) =>
        import LogicalTypeAnnotation.TimeUnit
        val l = v.asInstanceOf[java.lang.Long].longValue()
        val micros: Option[Long] = ts.getUnit match {
          case TimeUnit.MICROS => Some(l)
          case TimeUnit.MILLIS => Some(Math.multiplyExact(l, 1000L))
          case _ => None // NANOS: micros truncation is unsound for an upper bound
        }
        micros.map { us =>
          val sec = Math.floorDiv(us, 1000000L)
          val nano = Math.floorMod(us, 1000000L) * 1000L
          if (ts.isAdjustedToUTC) java.time.Instant.ofEpochSecond(sec, nano)
          else java.time.LocalDateTime.ofEpochSecond(sec, nano.toInt, java.time.ZoneOffset.UTC)
        }
      case _ => None // float/double (NaN), int96, unsigned, nested
    }
  }

  /** Read ONE file's footer. Plain java I/O — callable inside an
    * executor task (readAll) or driver-side for a handful of files. */
  def read(path: String): FileStats = {
    val p = path.replaceFirst("^file:/+", "/")
    val in = HadoopInputFile.fromPath(new Path(p), new Configuration())
    val reader = ParquetFileReader.open(in)
    try {
      val footer = reader.getFooter
      val blocks = footer.getBlocks.asScala.toSeq
      val rowCount = blocks.map(_.getRowCount).sum
      // per-column accumulator across row groups: bounds are valid only
      // if EVERY group either has sound bounds or is provably all-null
      // (an all-null group has no min/max but constrains nothing)
      final case class Acc(lower: Option[Any], upper: Option[Any],
          nulls: Option[Long], sound: Boolean)
      // top-level (path depth 1) columns only — our tables are flat
      val perCol = scala.collection.mutable.LinkedHashMap.empty[String, Acc]
      blocks.foreach { b =>
        b.getColumns.asScala.foreach { c =>
          val parts = c.getPath.toArray
          if (parts.length == 1) {
            val name = parts(0)
            val stats = c.getStatistics
            val haveStats = stats != null && !stats.isEmpty
            val (lo, hi) =
              if (!haveStats || !stats.hasNonNullValue) (None, None)
              else (boundValue(c.getPrimitiveType, stats.genericGetMin.asInstanceOf[AnyRef]),
                boundValue(c.getPrimitiveType, stats.genericGetMax.asInstanceOf[AnyRef]))
            val nulls =
              if (!haveStats || !stats.isNumNullsSet) None else Some(stats.getNumNulls)
            val allNull = haveStats && !stats.hasNonNullValue &&
              nulls.contains(b.getRowCount)
            val hasBounds = lo.isDefined && hi.isDefined
            val prev = perCol.getOrElse(name, Acc(None, None, Some(0L), true))
            def mergeLo(a: Option[Any], x: Option[Any]) = (a, x) match {
              case (Some(p0), Some(v)) => Some(if (cmpSame(v, p0) < 0) v else p0)
              case (p0, v) => p0.orElse(v)
            }
            def mergeHi(a: Option[Any], x: Option[Any]) = (a, x) match {
              case (Some(p0), Some(v)) => Some(if (cmpSame(v, p0) > 0) v else p0)
              case (p0, v) => p0.orElse(v)
            }
            perCol(name) = Acc(
              mergeLo(prev.lower, lo), mergeHi(prev.upper, hi),
              (prev.nulls, nulls) match {
                case (Some(a), Some(n)) => Some(a + n)
                case _ => None
              },
              prev.sound && (hasBounds || allNull))
          }
        }
      }
      val cols = perCol.map { case (n, a) =>
        n -> ColStats(if (a.sound) a.lower else None, if (a.sound) a.upper else None, a.nulls)
      }.toMap
      FileStats(p, rowCount, new java.io.File(p).length(), cols)
    } finally reader.close()
  }

  /** Footer stats for many files, read INSIDE tasks (one footer per
    * task slice) — only the per-file stat tuples transit the driver,
    * bounded by files × columns × small values. */
  def readAll(spark: SparkSession, paths: Seq[String]): Seq[FileStats] =
    if (paths.isEmpty) Seq.empty
    else if (paths.size <= 4) paths.map(read) // driver-side: fewer than a task's overhead
    else spark.sparkContext
      .parallelize(paths, math.max(1, math.min(paths.size, 32)))
      .map(read).collect().toSeq

  /** top-level column name → parquet field id, from the footer schema
    * (metadata-only). Empty map = the file carries no field ids; a
    * column without an id is simply absent from the map. Id-based
    * schema-evolution reads group files by this mapping. */
  def fieldIdsOf(path: String): Map[String, Int] = {
    val in = HadoopInputFile.fromPath(new Path(path), new Configuration())
    val r = ParquetFileReader.open(in)
    try {
      r.getFooter.getFileMetaData.getSchema.getFields.asScala.flatMap { t =>
        Option(t.getId).map(id => t.getName -> id.intValue())
      }.toMap
    } finally r.close()
  }

  def fieldIdsAll(spark: SparkSession, paths: Seq[String]): Map[String, Map[String, Int]] =
    if (paths.isEmpty) Map.empty
    else if (paths.size <= 4) paths.map(p => p -> fieldIdsOf(p)).toMap
    else spark.sparkContext
      .parallelize(paths, math.max(1, math.min(paths.size, 32)))
      .map(p => p -> fieldIdsOf(p)).collect().toMap
}
