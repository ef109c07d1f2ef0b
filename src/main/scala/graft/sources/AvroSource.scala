package graft.sources

import java.io.DataInputStream

import scala.jdk.CollectionConverters._

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro Object Container File source/sink (cdf: crates/cdf-format-avro/,
  * SURVEY §2.1 "Avro OCF + single-object").
  *
  * Spark-first shape without the spark-avro module (not on this
  * classpath): the OCF codec runs per-partition on executors — write
  * emits one container file per partition (the same layout
  * `df.write.avro` would produce), read fans out one task per file via
  * `binaryFiles` and streams records through `DataFileStream` (OCF
  * blocks decode sequentially; parallelism is per-file, matching the
  * reference's file-level decode pipeline). No data ever passes
  * through the driver.
  *
  * Type lattice: the primitive subset of CanonicalTypes — long/int/
  * double/float/boolean/string/binary, plus date (logical int days)
  * and timestamp-micros (logical long) — nullable via union[null, T].
  * Decimals/nested structs are out of the Avro surface here (the
  * package format is Parquet; Avro is an interchange codec).
  */
object AvroSource {

  // ------------------------------------------------------------- schema

  def toAvroSchema(st: StructType, recordName: String = "graft_record"): Schema = {
    val fields = st.fields.map { f =>
      val base = f.dataType match {
        case LongType => Schema.create(Schema.Type.LONG)
        case IntegerType | ShortType | ByteType => Schema.create(Schema.Type.INT)
        case DoubleType => Schema.create(Schema.Type.DOUBLE)
        case FloatType => Schema.create(Schema.Type.FLOAT)
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case StringType => Schema.create(Schema.Type.STRING)
        case BinaryType => Schema.create(Schema.Type.BYTES)
        case DateType =>
          val s = Schema.create(Schema.Type.INT)
          org.apache.avro.LogicalTypes.date().addToSchema(s)
        case TimestampType =>
          val s = Schema.create(Schema.Type.LONG)
          org.apache.avro.LogicalTypes.timestampMicros().addToSchema(s)
        case other => throw new IllegalArgumentException(
          s"avro surface does not cover ${f.name}: $other")
      }
      val sch = if (f.nullable) Schema.createUnion(Schema.create(Schema.Type.NULL), base) else base
      new Schema.Field(f.name, sch, null, if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null)
    }
    Schema.createRecord(recordName, null, "graft", false, fields.toList.asJava)
  }

  def toSparkSchema(avro: Schema): StructType = {
    require(avro.getType == Schema.Type.RECORD, s"expected record schema, got ${avro.getType}")
    StructType(avro.getFields.asScala.map { f =>
      val (s, nullable) = f.schema().getType match {
        case Schema.Type.UNION =>
          val nonNull = f.schema().getTypes.asScala.filter(_.getType != Schema.Type.NULL)
          require(nonNull.size == 1, s"only union[null,T] supported: ${f.schema()}")
          (nonNull.head, true)
        case _ => (f.schema(), false)
      }
      val dt = (s.getType, Option(s.getLogicalType).map(_.getName)) match {
        case (Schema.Type.LONG, Some("timestamp-micros")) => TimestampType
        case (Schema.Type.INT, Some("date")) => DateType
        case (Schema.Type.LONG, _) => LongType
        case (Schema.Type.INT, _) => IntegerType
        case (Schema.Type.DOUBLE, _) => DoubleType
        case (Schema.Type.FLOAT, _) => FloatType
        case (Schema.Type.BOOLEAN, _) => BooleanType
        case (Schema.Type.STRING, _) => StringType
        case (Schema.Type.BYTES, _) => BinaryType
        case other => throw new IllegalArgumentException(s"unsupported avro type $other")
      }
      StructField(f.name, dt, nullable)
    }.toSeq)
  }

  // -------------------------------------------------------------- write

  /** One OCF file per partition under `dir` (executor-side; driver only
    * plans). Returns the file count. */
  def write(df: DataFrame, dir: String): Int = {
    val st = df.schema
    val avroJson = toAvroSchema(st).toString // Schema isn't serializable-stable; ship JSON
    new java.io.File(dir).mkdirs()
    val written = df.rdd.mapPartitionsWithIndex { (pid, it) =>
      if (it.isEmpty) Iterator.empty
      else {
        val schema = new Schema.Parser().parse(avroJson)
        val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
        val f = new java.io.File(dir, f"part-$pid%05d.avro")
        w.create(schema, f)
        var n = 0L
        it.foreach { row =>
          val rec = new GenericData.Record(schema)
          var i = 0
          while (i < st.length) {
            rec.put(i, encodeValue(row, i, st.fields(i).dataType))
            i += 1
          }
          w.append(rec); n += 1
        }
        w.close()
        Iterator.single(f.getName)
      }
    }.collect()
    written.length
  }

  private def encodeValue(row: Row, i: Int, dt: DataType): AnyRef =
    if (row.isNullAt(i)) null
    else dt match {
      case LongType => Long.box(row.getLong(i))
      case IntegerType => Int.box(row.getInt(i))
      case ShortType => Int.box(row.getShort(i).toInt)
      case ByteType => Int.box(row.getByte(i).toInt)
      case DoubleType => Double.box(row.getDouble(i))
      case FloatType => Float.box(row.getFloat(i))
      case BooleanType => Boolean.box(row.getBoolean(i))
      case StringType => row.getString(i)
      case BinaryType => java.nio.ByteBuffer.wrap(row.getAs[Array[Byte]](i))
      case DateType => Int.box(row.getDate(i).toLocalDate.toEpochDay.toInt)
      case TimestampType => Long.box(row.getTimestamp(i).getTime * 1000L +
        (row.getTimestamp(i).getNanos / 1000L) % 1000L)
      case other => throw new IllegalArgumentException(s"avro encode: $other")
    }

  // --------------------------------------------------------------- read

  /** Distributed OCF read: one task per container file. Schema comes
    * from the first file's header unless supplied. */
  def read(spark: SparkSession, pathGlob: String, schema: Option[StructType] = None): DataFrame = {
    val st = schema.getOrElse {
      val first = FileSource.discover(
        pathGlob.take(pathGlob.lastIndexOf('/')),
        pathGlob.drop(pathGlob.lastIndexOf('/') + 1)).files.headOption
        .getOrElse(throw new IllegalArgumentException(s"no avro files match $pathGlob"))
      val in = new DataFileStream(
        new DataInputStream(new java.io.FileInputStream(first.path)),
        new GenericDatumReader[GenericRecord]())
      try toSparkSchema(in.getSchema) finally in.close()
    }
    val fields = st.fields
    val rows = spark.sparkContext.binaryFiles(pathGlob).flatMap { case (_, pds) =>
      val in = new DataFileStream(new DataInputStream(pds.open()),
        new GenericDatumReader[GenericRecord]())
      new Iterator[Row] {
        def hasNext: Boolean = { val h = in.hasNext; if (!h) in.close(); h }
        def next(): Row = {
          val rec = in.next()
          Row.fromSeq(fields.indices.map(i => decodeValue(rec.get(fields(i).name), fields(i).dataType)))
        }
      }
    }
    spark.createDataFrame(rows, st)
  }

  private def decodeValue(v: AnyRef, dt: DataType): Any =
    if (v == null) null
    else dt match {
      case StringType => v.toString // avro Utf8 → String
      case BinaryType =>
        val bb = v.asInstanceOf[java.nio.ByteBuffer]
        val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
      case DateType => java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(
        v.asInstanceOf[Int].toLong))
      case TimestampType =>
        val us = v.asInstanceOf[Long]
        val ts = new java.sql.Timestamp(Math.floorDiv(us, 1000L))
        ts.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
        ts
      case _ => v
    }
}
