package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.ipc.{ArrowFileReader, ArrowFileWriter}
import org.apache.arrow.vector.types.{FloatingPointPrecision, TimeUnit => ArrowTimeUnit}
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ArrowSchema}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Arrow IPC FILE format source/sink (cdf: crates/cdf-format-arrow-ipc/
  * — the reference's package segments are Arrow IPC files replayed by
  * memory-map; SURVEY §2.1 Arrow IPC row).
  *
  * Spark-first shape, mirroring AvroSource: the codec runs
  * per-partition on executors — write emits one IPC file per partition
  * (record batches of `batchRows`, with the footer that makes the file
  * format seekable/mmap-able), read fans out one task per file. No
  * data passes through the driver. Our packages remain Parquet
  * (SURVEY §7.1 decision); Arrow IPC is the interchange codec for
  * systems that speak it natively.
  *
  * Type lattice: the same primitive subset as the Avro surface —
  * long/int/double/float/boolean/string/binary + date(day)/
  * timestamp-micros(UTC) — nullable throughout.
  */
object ArrowIpcSource {

  // ------------------------------------------------------------- schema

  def toArrowSchema(st: StructType): ArrowSchema = {
    val fields = st.fields.map { f =>
      val at: ArrowType = f.dataType match {
        case LongType => new ArrowType.Int(64, true)
        case IntegerType => new ArrowType.Int(32, true)
        case DoubleType => new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)
        case FloatType => new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE)
        case BooleanType => ArrowType.Bool.INSTANCE
        case StringType => ArrowType.Utf8.INSTANCE
        case BinaryType => ArrowType.Binary.INSTANCE
        case DateType => new ArrowType.Date(org.apache.arrow.vector.types.DateUnit.DAY)
        case TimestampType => new ArrowType.Timestamp(ArrowTimeUnit.MICROSECOND, "UTC")
        case other => throw new IllegalArgumentException(
          s"arrow surface does not cover ${f.name}: $other")
      }
      new Field(f.name, FieldType.nullable(at), java.util.List.of())
    }
    new ArrowSchema(fields.toList.asJava)
  }

  def toSparkSchema(as: ArrowSchema): StructType =
    StructType(as.getFields.asScala.map { f =>
      val dt = f.getType match {
        case i: ArrowType.Int if i.getBitWidth == 64 => LongType
        case i: ArrowType.Int if i.getBitWidth == 32 => IntegerType
        case fp: ArrowType.FloatingPoint if fp.getPrecision == FloatingPointPrecision.DOUBLE => DoubleType
        case fp: ArrowType.FloatingPoint if fp.getPrecision == FloatingPointPrecision.SINGLE => FloatType
        case _: ArrowType.Bool => BooleanType
        case _: ArrowType.Utf8 => StringType
        case _: ArrowType.Binary => BinaryType
        case _: ArrowType.Date => DateType
        case t: ArrowType.Timestamp if t.getUnit == ArrowTimeUnit.MICROSECOND => TimestampType
        case other => throw new IllegalArgumentException(s"unsupported arrow type $other")
      }
      StructField(f.getName, dt, nullable = true)
    }.toSeq)

  // -------------------------------------------------------------- write

  /** One IPC file per partition under `dir`; returns the file count. */
  def write(df: DataFrame, dir: String, batchRows: Int = 4096): Int = {
    val st = df.schema
    new java.io.File(dir).mkdirs()
    val written = df.rdd.mapPartitionsWithIndex { (pid, it) =>
      if (it.isEmpty) Iterator.empty
      else {
        val alloc = new RootAllocator(Long.MaxValue)
        val root = VectorSchemaRoot.create(toArrowSchema(st), alloc)
        val file = new java.io.File(dir, f"part-$pid%05d.arrow")
        val ch = new java.io.FileOutputStream(file).getChannel
        val w = new ArrowFileWriter(root, null, ch)
        w.start()
        val buf = it.grouped(batchRows)
        buf.foreach { rows =>
          root.allocateNew()
          var r = 0
          rows.foreach { row =>
            var c = 0
            while (c < st.length) {
              setValue(root.getVector(c), r, row, c, st.fields(c).dataType)
              c += 1
            }
            r += 1
          }
          root.setRowCount(r)
          w.writeBatch()
        }
        w.end(); w.close(); ch.close(); root.close(); alloc.close()
        Iterator.single(file.getName)
      }
    }.collect()
    written.length
  }

  private def setValue(v: FieldVector, idx: Int, row: Row, col: Int, dt: DataType): Unit =
    if (row.isNullAt(col)) v match {
      case x: BaseFixedWidthVector => x.setNull(idx)
      case x: BaseVariableWidthVector => x.setNull(idx)
      case x => throw new IllegalArgumentException(s"cannot null ${x.getClass}")
    } else dt match {
      case LongType => v.asInstanceOf[BigIntVector].setSafe(idx, row.getLong(col))
      case IntegerType => v.asInstanceOf[IntVector].setSafe(idx, row.getInt(col))
      case DoubleType => v.asInstanceOf[Float8Vector].setSafe(idx, row.getDouble(col))
      case FloatType => v.asInstanceOf[Float4Vector].setSafe(idx, row.getFloat(col))
      case BooleanType => v.asInstanceOf[BitVector].setSafe(idx, if (row.getBoolean(col)) 1 else 0)
      case StringType => v.asInstanceOf[VarCharVector].setSafe(idx,
        row.getString(col).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      case BinaryType => v.asInstanceOf[VarBinaryVector].setSafe(idx, row.getAs[Array[Byte]](col))
      case DateType => v.asInstanceOf[DateDayVector].setSafe(idx,
        row.getDate(col).toLocalDate.toEpochDay.toInt)
      case TimestampType =>
        val ts = row.getTimestamp(col)
        v.asInstanceOf[TimeStampMicroTZVector].setSafe(idx,
          ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L)
      case other => throw new IllegalArgumentException(s"arrow encode: $other")
    }

  // --------------------------------------------------------------- read

  /** Distributed IPC read: one task per file; the FILE-format footer
    * lets each task see the schema + batch offsets without scanning
    * (mmap replay in the reference). Schema from the first file unless
    * supplied. */
  def read(spark: SparkSession, pathGlob: String, schema: Option[StructType] = None): DataFrame = {
    val st = schema.getOrElse {
      val first = FileSource.discover(
        pathGlob.take(pathGlob.lastIndexOf('/')),
        pathGlob.drop(pathGlob.lastIndexOf('/') + 1)).files.headOption
        .getOrElse(throw new IllegalArgumentException(s"no arrow files match $pathGlob"))
      val alloc = new RootAllocator(Long.MaxValue)
      val ch = new java.io.RandomAccessFile(first.path, "r").getChannel
      val r = new ArrowFileReader(ch, alloc)
      try toSparkSchema(r.getVectorSchemaRoot.getSchema)
      finally { r.close(); ch.close(); alloc.close() }
    }
    val fields = st.fields
    val files = FileSource.discover(
      pathGlob.take(pathGlob.lastIndexOf('/')),
      pathGlob.drop(pathGlob.lastIndexOf('/') + 1)).files.map(_.path)
    // one task per IPC file (binaryFiles would pack small files into
    // one partition and serialize the decode)
    val rows = spark.sparkContext.parallelize(files, math.max(1, files.size)).flatMap { path =>
      val local = path.stripPrefix("file:")
      val alloc = new RootAllocator(Long.MaxValue)
      val ch = new java.io.RandomAccessFile(local, "r").getChannel
      val reader = new ArrowFileReader(ch, alloc)
      val root = reader.getVectorSchemaRoot
      val out = Seq.newBuilder[Row]
      while (reader.loadNextBatch()) {
        val n = root.getRowCount
        var r = 0
        while (r < n) {
          out += Row.fromSeq(fields.indices.map(c =>
            getValue(root.getVector(c), r, fields(c).dataType)))
          r += 1
        }
      }
      reader.close(); ch.close(); alloc.close()
      out.result().iterator
    }
    spark.createDataFrame(rows, st)
  }

  private def getValue(v: FieldVector, idx: Int, dt: DataType): Any =
    if (v.isNull(idx)) null
    else dt match {
      case LongType => v.asInstanceOf[BigIntVector].get(idx)
      case IntegerType => v.asInstanceOf[IntVector].get(idx)
      case DoubleType => v.asInstanceOf[Float8Vector].get(idx)
      case FloatType => v.asInstanceOf[Float4Vector].get(idx)
      case BooleanType => v.asInstanceOf[BitVector].get(idx) == 1
      case StringType => new String(v.asInstanceOf[VarCharVector].get(idx),
        java.nio.charset.StandardCharsets.UTF_8)
      case BinaryType => v.asInstanceOf[VarBinaryVector].get(idx)
      case DateType => java.sql.Date.valueOf(
        java.time.LocalDate.ofEpochDay(v.asInstanceOf[DateDayVector].get(idx).toLong))
      case TimestampType =>
        val us = v.asInstanceOf[TimeStampMicroTZVector].get(idx)
        val ts = new java.sql.Timestamp(Math.floorDiv(us, 1000L))
        ts.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
        ts
      case other => throw new IllegalArgumentException(s"arrow decode: $other")
    }
}
