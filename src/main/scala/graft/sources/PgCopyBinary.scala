package graft.sources

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** PostgreSQL COPY BINARY wire codec (the public "Binary Format" of
  * `COPY ... WITH (FORMAT binary)`: 11-byte signature, int32 flags,
  * int32 extension length, then per tuple an int16 field count and
  * length-prefixed network-order fields, closed by an int16 -1
  * trailer).
  *
  * This is the encode/decode half of the reference's fast Postgres
  * load path (cdf: crates/cdf-dest-postgres/src/commit.rs:678-943 —
  * staged COPY BINARY then merge_from_stage; the envelope's own bar is
  * "binary COPY ≥2× CSV COPY"). No server exists in this container, so
  * the stream lands in `.pgcopy` files — exactly the bytes a
  * deployment would feed to `COPY FROM STDIN`; the staging-merge SQL
  * itself is proven in `Jdbc` against embedded Derby.
  *
  * Spark-first: one complete COPY stream per partition, encoded and
  * decoded executor-side (the same per-partition shape as the Avro and
  * Arrow codecs — a real load would open one COPY per partition, which
  * is how parallel COPY works).
  *
  * Lattice: int8/int4, float8/float4, bool, text, bytea,
  * date (days since 2000-01-01), timestamp (micros since PG epoch),
  * and NUMERIC in its base-10000 digit-group encoding — decimals
  * travel digit-exact, the reference's decimal-fidelity law.
  */
object PgCopyBinary {

  private val Signature: Array[Byte] =
    Array('P', 'G', 'C', 'O', 'P', 'Y', '\n', 0xFF.toByte, '\r', '\n', 0x00).map(_.toByte)

  private val PgEpochDay: Long = java.time.LocalDate.of(2000, 1, 1).toEpochDay
  private val PgEpochMicros: Long = 946684800000000L // 2000-01-01T00:00:00Z in unix micros

  // ------------------------------------------------------------ encode

  def encodeStream(rows: Iterator[Row], schema: StructType): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.write(Signature)
    out.writeInt(0) // flags
    out.writeInt(0) // header extension length
    val fields = schema.fields
    rows.foreach { row =>
      out.writeShort(fields.length)
      var i = 0
      while (i < fields.length) {
        if (row.isNullAt(i)) out.writeInt(-1)
        else {
          val bytes = encodeField(row, i, fields(i).dataType)
          out.writeInt(bytes.length)
          out.write(bytes)
        }
        i += 1
      }
    }
    out.writeShort(-1) // trailer
    out.flush()
    bos.toByteArray
  }

  private def encodeField(row: Row, i: Int, dt: DataType): Array[Byte] = dt match {
    case LongType => ByteBuffer.allocate(8).putLong(row.getLong(i)).array()
    case IntegerType => ByteBuffer.allocate(4).putInt(row.getInt(i)).array()
    case DoubleType => ByteBuffer.allocate(8).putDouble(row.getDouble(i)).array()
    case FloatType => ByteBuffer.allocate(4).putFloat(row.getFloat(i)).array()
    case BooleanType => Array[Byte](if (row.getBoolean(i)) 1 else 0)
    case StringType => row.getString(i).getBytes(java.nio.charset.StandardCharsets.UTF_8)
    case BinaryType => row.getAs[Array[Byte]](i)
    case DateType =>
      val days = row.getDate(i).toLocalDate.toEpochDay - PgEpochDay
      ByteBuffer.allocate(4).putInt(days.toInt).array()
    case TimestampType =>
      val ts = row.getTimestamp(i)
      val us = ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L - PgEpochMicros
      ByteBuffer.allocate(8).putLong(us).array()
    case _: DecimalType => encodeNumeric(row.getDecimal(i))
    case other => throw new IllegalArgumentException(s"pgcopy surface: $other")
  }

  /** NUMERIC: int16 ndigits, int16 weight, int16 sign (0x4000 = neg),
    * int16 dscale, then base-10000 digit groups most-significant
    * first; weight = index of the first group relative to the units
    * group. */
  private[graft] def encodeNumeric(d: java.math.BigDecimal): Array[Byte] = {
    val dscale = math.max(d.scale(), 0)
    val neg = d.signum() < 0
    val abs = d.abs().stripTrailingZeros()
    if (abs.unscaledValue().signum() == 0) {
      val b = ByteBuffer.allocate(8)
      b.putShort(0); b.putShort(0); b.putShort(0); b.putShort(dscale.toShort)
      return b.array()
    }
    // align the decimal point to a base-10000 group boundary
    val scale = abs.scale()
    val fracGroups = (math.max(scale, 0) + 3) / 4
    val shifted = abs.movePointRight(fracGroups * 4).toBigIntegerExact
    val groups = collection.mutable.ArrayBuffer.empty[Short]
    var v = shifted
    val tenK = java.math.BigInteger.valueOf(10000)
    while (v.signum() != 0) {
      val qr = v.divideAndRemainder(tenK)
      groups += qr(1).intValue().toShort
      v = qr(0)
    }
    val msfirst = groups.reverse
    val weight = msfirst.length - 1 - fracGroups
    // drop trailing zero groups (value unchanged; weight is absolute)
    val trimmed = msfirst.reverse.dropWhile(_ == 0).reverse
    val b = ByteBuffer.allocate(8 + trimmed.length * 2)
    b.putShort(trimmed.length.toShort)
    b.putShort(weight.toShort)
    b.putShort(if (neg) 0x4000.toShort else 0x0000.toShort)
    b.putShort(dscale.toShort)
    trimmed.foreach(b.putShort)
    b.array()
  }

  private[graft] def decodeNumeric(bytes: Array[Byte]): java.math.BigDecimal = {
    val b = ByteBuffer.wrap(bytes)
    val ndigits = b.getShort.toInt
    val weight = b.getShort.toInt
    val sign = b.getShort
    val dscale = b.getShort.toInt
    var acc = java.math.BigDecimal.ZERO
    var i = 0
    while (i < ndigits) {
      val g = java.math.BigDecimal.valueOf(b.getShort.toLong)
      acc = acc.add(g.movePointRight((weight - i) * 4))
      i += 1
    }
    val signed = if (sign == 0x4000.toShort) acc.negate() else acc
    signed.setScale(dscale)
  }

  /** the 19-byte stream header (signature + flags + extension length)
    * and 2-byte trailer, exposed so a server can frame per-tuple. */
  private[graft] def headerBytes: Array[Byte] = {
    val b = ByteBuffer.allocate(19)
    b.put(Signature); b.putInt(0); b.putInt(0)
    b.array()
  }
  private[graft] val trailerBytes: Array[Byte] = Array(0xFF.toByte, 0xFF.toByte)

  /** one tuple's bytes (field count + length-prefixed fields) — the
    * unit a real server sends as a single CopyData frame. */
  private[graft] def encodeTuple(row: Row, schema: StructType): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val fields = schema.fields
    out.writeShort(fields.length)
    var i = 0
    while (i < fields.length) {
      if (row.isNullAt(i)) out.writeInt(-1)
      else {
        val bytes = encodeField(row, i, fields(i).dataType)
        out.writeInt(bytes.length)
        out.write(bytes)
      }
      i += 1
    }
    out.flush()
    bos.toByteArray
  }

  // ------------------------------------------------------------ decode

  def decodeStream(bytes: Array[Byte], schema: StructType): Iterator[Row] =
    decodeFrom(new java.io.ByteArrayInputStream(bytes), schema)

  /** Incremental decode STRAIGHT OFF a stream — one tuple materialized
    * at a time, never the whole payload (the executor-side scan path:
    * the stream is [[PgWireClient.copyOutStream]]'s lazy frame reader,
    * so a 100 TB COPY holds one frame + one tuple per task). */
  def decodeFrom(in0: java.io.InputStream, schema: StructType): Iterator[Row] = {
    val in = new java.io.DataInputStream(in0)
    val sig = new Array[Byte](11); in.readFully(sig)
    require(java.util.Arrays.equals(sig, Signature), "bad PGCOPY signature")
    require(in.readInt() == 0, "unsupported COPY flags")
    val ext = in.readInt()
    if (ext > 0) in.skipNBytes(ext.toLong)
    val fields = schema.fields
    new Iterator[Row] {
      private var nextCount: Int = in.readShort().toInt
      override def hasNext: Boolean = nextCount != -1
      override def next(): Row = {
        require(nextCount == fields.length,
          s"tuple has $nextCount fields, schema has ${fields.length}")
        val vals = fields.map { f =>
          val len = in.readInt()
          if (len == -1) null
          else {
            val data = new Array[Byte](len); in.readFully(data)
            decodeField(data, f.dataType)
          }
        }
        nextCount = in.readShort().toInt
        Row.fromSeq(vals.toSeq)
      }
    }
  }

  private def decodeField(data: Array[Byte], dt: DataType): Any = dt match {
    case LongType => ByteBuffer.wrap(data).getLong
    case IntegerType => ByteBuffer.wrap(data).getInt
    case DoubleType => ByteBuffer.wrap(data).getDouble
    case FloatType => ByteBuffer.wrap(data).getFloat
    case BooleanType => data(0) == 1
    case StringType => new String(data, java.nio.charset.StandardCharsets.UTF_8)
    case BinaryType => data
    case DateType => java.sql.Date.valueOf(
      java.time.LocalDate.ofEpochDay(ByteBuffer.wrap(data).getInt.toLong + PgEpochDay))
    case TimestampType =>
      val us = ByteBuffer.wrap(data).getLong + PgEpochMicros
      val ts = new java.sql.Timestamp(Math.floorDiv(us, 1000L))
      ts.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
      ts
    case _: DecimalType => decodeNumeric(data)
    case other => throw new IllegalArgumentException(s"pgcopy decode: $other")
  }

  // ------------------------------------------------------- files (dir)

  /** One complete COPY stream per partition under `dir` (the bytes a
    * parallel `COPY FROM STDIN WITH (FORMAT binary)` would receive). */
  def write(df: DataFrame, dir: String): Int = {
    val st = df.schema
    new java.io.File(dir).mkdirs()
    val written = df.rdd.mapPartitionsWithIndex { (pid, it) =>
      if (it.isEmpty) Iterator.empty
      else {
        val f = new java.io.File(dir, f"part-$pid%05d.pgcopy")
        java.nio.file.Files.write(f.toPath, encodeStream(it, st))
        Iterator.single(f.getName)
      }
    }.collect()
    written.length
  }

  def read(spark: SparkSession, pathGlob: String, schema: StructType): DataFrame = {
    val files = FileSource.discover(
      pathGlob.take(pathGlob.lastIndexOf('/')),
      pathGlob.drop(pathGlob.lastIndexOf('/') + 1)).files.map(_.path)
    val rows = spark.sparkContext.parallelize(files, math.max(1, files.size)).flatMap { p =>
      decodeStream(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(p.stripPrefix("file:"))), schema)
    }
    spark.createDataFrame(rows, schema)
  }
}
