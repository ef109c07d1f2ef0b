package graft.sources

import java.io.{ByteArrayOutputStream, DataInputStream, EOFException, InputStream}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Framed protobuf decode/encode (cdf: crates/cdf-format-protobuf/,
  * SURVEY §2.1 "Protobuf framed").
  *
  * No protobuf-java on this classpath, so the wire format is
  * implemented directly — it is small: varint tags `(field_no << 3) |
  * wire_type`, wire types 0 (varint), 1 (fixed64), 2 (length-
  * delimited), 5 (fixed32). Messages are framed with a varint length
  * prefix (the standard `writeDelimitedTo` stream shape the reference
  * consumes). The descriptor is a typed `MessageSpec` (field number →
  * name/type), the analogue of the reference's compiled descriptor set.
  *
  * Spark shape: encode runs per-partition to one framed file per
  * partition; decode fans out one task per file (`binaryFiles`) and
  * streams frames — the driver never touches payload bytes. Unknown
  * fields are skipped by wire type (forward compatibility), missing
  * fields decode as null.
  */
object ProtobufFraming {

  sealed trait PType
  object PType {
    case object VarintLong extends PType   // int64/int32 two's-complement varint
    case object ZigZagLong extends PType   // sint64/sint32
    case object Bool extends PType
    case object Fixed64Double extends PType
    case object Fixed32Float extends PType
    case object Str extends PType
    case object Bytes extends PType
  }

  final case class FieldSpec(number: Int, name: String, ptype: PType, nullable: Boolean = true)
  final case class MessageSpec(fields: Seq[FieldSpec]) {
    require(fields.map(_.number).distinct.size == fields.size, "duplicate field numbers")
    def sparkSchema: StructType = StructType(fields.map { f =>
      StructField(f.name, f.ptype match {
        case PType.VarintLong | PType.ZigZagLong => LongType
        case PType.Bool => BooleanType
        case PType.Fixed64Double => DoubleType
        case PType.Fixed32Float => FloatType
        case PType.Str => StringType
        case PType.Bytes => BinaryType
      }, f.nullable)
    })
  }

  // ------------------------------------------------------------ varint

  private def writeVarint(out: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }

  private def readVarint(in: InputStream): Long = {
    var shift = 0; var result = 0L
    while (shift < 64) {
      val b = in.read()
      if (b < 0) throw new EOFException("varint")
      result |= (b & 0x7fL) << shift
      if ((b & 0x80) == 0) return result
      shift += 7
    }
    throw new IllegalArgumentException("varint too long")
  }

  private def zigzagEncode(v: Long): Long = (v << 1) ^ (v >> 63)
  private def zigzagDecode(v: Long): Long = (v >>> 1) ^ -(v & 1)

  // ----------------------------------------------------------- message

  private def wireType(t: PType): Int = t match {
    case PType.VarintLong | PType.ZigZagLong | PType.Bool => 0
    case PType.Fixed64Double => 1
    case PType.Str | PType.Bytes => 2
    case PType.Fixed32Float => 5
  }

  def encodeMessage(spec: MessageSpec, row: Row): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    spec.fields.zipWithIndex.foreach { case (f, i) =>
      if (!row.isNullAt(i)) {
        writeVarint(out, ((f.number.toLong << 3) | wireType(f.ptype)))
        f.ptype match {
          case PType.VarintLong => writeVarint(out, row.getLong(i))
          case PType.ZigZagLong => writeVarint(out, zigzagEncode(row.getLong(i)))
          case PType.Bool => out.write(if (row.getBoolean(i)) 1 else 0)
          case PType.Fixed64Double =>
            val bits = java.lang.Double.doubleToLongBits(row.getDouble(i))
            var k = 0; while (k < 8) { out.write(((bits >>> (8 * k)) & 0xff).toInt); k += 1 }
          case PType.Fixed32Float =>
            val bits = java.lang.Float.floatToIntBits(row.getFloat(i))
            var k = 0; while (k < 4) { out.write((bits >>> (8 * k)) & 0xff); k += 1 }
          case PType.Str =>
            val b = row.getString(i).getBytes("UTF-8")
            writeVarint(out, b.length.toLong); out.write(b)
          case PType.Bytes =>
            val b = row.getAs[Array[Byte]](i)
            writeVarint(out, b.length.toLong); out.write(b)
        }
      }
    }
    out.toByteArray
  }

  def decodeMessage(spec: MessageSpec, bytes: Array[Byte]): Row = {
    val byNumber = spec.fields.map(f => f.number -> f).toMap
    val slot = spec.fields.map(_.number).zipWithIndex.toMap
    val values = new Array[Any](spec.fields.size)
    val in = new java.io.ByteArrayInputStream(bytes)
    while (in.available() > 0) {
      val tag = readVarint(in)
      val num = (tag >>> 3).toInt
      val wt = (tag & 7).toInt
      byNumber.get(num) match {
        case Some(f) if wireType(f.ptype) == wt =>
          values(slot(num)) = f.ptype match {
            case PType.VarintLong => readVarint(in)
            case PType.ZigZagLong => zigzagDecode(readVarint(in))
            case PType.Bool => readVarint(in) != 0L
            case PType.Fixed64Double =>
              var bits = 0L; var k = 0
              while (k < 8) { bits |= (in.read().toLong & 0xff) << (8 * k); k += 1 }
              java.lang.Double.longBitsToDouble(bits)
            case PType.Fixed32Float =>
              var bits = 0; var k = 0
              while (k < 4) { bits |= (in.read() & 0xff) << (8 * k); k += 1 }
              java.lang.Float.intBitsToFloat(bits)
            case PType.Str =>
              val n = readVarint(in).toInt
              val b = new Array[Byte](n); var off = 0
              while (off < n) { val r = in.read(b, off, n - off); require(r > 0, "eof in string"); off += r }
              new String(b, "UTF-8")
            case PType.Bytes =>
              val n = readVarint(in).toInt
              val b = new Array[Byte](n); var off = 0
              while (off < n) { val r = in.read(b, off, n - off); require(r > 0, "eof in bytes"); off += r }
              b
          }
        case _ => skipField(in, wt) // unknown or re-typed field: skip by wire type
      }
    }
    Row.fromSeq(values.toSeq)
  }

  private def skipField(in: InputStream, wt: Int): Unit = wt match {
    case 0 => readVarint(in); ()
    case 1 => var k = 0; while (k < 8) { in.read(); k += 1 }
    case 2 => val n = readVarint(in).toInt; var k = 0; while (k < n) { in.read(); k += 1 }
    case 5 => var k = 0; while (k < 4) { in.read(); k += 1 }
    case other => throw new IllegalArgumentException(s"unsupported wire type $other")
  }

  // ------------------------------------------------------------ framed

  /** Encode a DataFrame to varint-length-framed files, one per
    * partition (executor-side). */
  def write(df: DataFrame, spec: MessageSpec, dir: String): Int = {
    val schema = df.schema
    require(schema.length == spec.fields.length, "spec/schema arity mismatch")
    new java.io.File(dir).mkdirs()
    val written = df.rdd.mapPartitionsWithIndex { (pid, it) =>
      if (it.isEmpty) Iterator.empty
      else {
        val f = new java.io.File(dir, f"part-$pid%05d.pb")
        val out = new java.io.BufferedOutputStream(new java.io.FileOutputStream(f))
        val lenBuf = new ByteArrayOutputStream()
        it.foreach { row =>
          val msg = encodeMessage(spec, row)
          lenBuf.reset(); writeVarint(lenBuf, msg.length.toLong)
          out.write(lenBuf.toByteArray); out.write(msg)
        }
        out.close()
        Iterator.single(f.getName)
      }
    }.collect()
    written.length
  }

  /** Distributed framed read: one task per file, streaming frames. */
  def read(spark: SparkSession, pathGlob: String, spec: MessageSpec): DataFrame = {
    val rows = spark.sparkContext.binaryFiles(pathGlob).flatMap { case (_, pds) =>
      val in = new DataInputStream(new java.io.BufferedInputStream(pds.open()))
      new Iterator[Row] {
        private var nextFrame: Array[Byte] = advance()
        private def advance(): Array[Byte] =
          try {
            val n = readVarint(in).toInt
            val b = new Array[Byte](n)
            in.readFully(b)
            b
          } catch { case _: EOFException => in.close(); null }
        def hasNext: Boolean = nextFrame != null
        def next(): Row = {
          val r = decodeMessage(spec, nextFrame)
          nextFrame = advance()
          r
        }
      }
    }
    spark.createDataFrame(rows, spec.sparkSchema)
  }
}
