package graft

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.sources.{AvroSource, Decompress, ProtobufFraming}

class FormatsSpec extends SparkSpec {

  private val typedSchema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("n", IntegerType, nullable = true),
    StructField("d", DoubleType, nullable = true),
    StructField("f", FloatType, nullable = true),
    StructField("b", BooleanType, nullable = true),
    StructField("s", StringType, nullable = true),
    StructField("bin", BinaryType, nullable = true),
    StructField("dt", DateType, nullable = true),
    StructField("ts", TimestampType, nullable = true)))

  private def typedRows = Seq(
    Row(1L, 42, 3.5, 1.25f, true, "héllo\nworld", Array[Byte](1, 2, 3),
      Date.valueOf("2024-02-29"), Timestamp.valueOf("2024-01-01 12:34:56.123456")),
    Row(2L, null, null, null, null, null, null, null, null),
    Row(3L, -7, -0.0, Float.MinPositiveValue, false, "", Array.empty[Byte],
      Date.valueOf("1969-12-31"), Timestamp.valueOf("1969-12-31 23:59:59.999999")))

  test("avro OCF round-trips the full type lattice incl. nulls, dates, micros timestamps") {
    val dir = tmpDir() + "/avro"
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(typedRows, 2), typedSchema)
    val files = AvroSource.write(df, dir)
    assert(files >= 1)
    // schema inferred from the container header, no hint needed
    val back = AvroSource.read(spark, s"$dir/part-*.avro")
    assert(back.schema.map(f => (f.name, f.dataType)) == typedSchema.map(f => (f.name, f.dataType)))
    val a = df.collect().map(_.toSeq.map(canon)).sortBy(_.head.toString)
    val b = back.collect().map(_.toSeq.map(canon)).sortBy(_.head.toString)
    assert(a.toSeq == b.toSeq)
  }

  private def canon(v: Any): Any = v match {
    case a: Array[Byte] => a.toSeq
    case x => x
  }

  test("protobuf framed: round-trip, zigzag negatives, unknown-field forward-compat skip") {
    import ProtobufFraming._
    val spec = MessageSpec(Seq(
      FieldSpec(1, "id", PType.VarintLong, nullable = false),
      FieldSpec(2, "delta", PType.ZigZagLong),
      FieldSpec(3, "score", PType.Fixed64Double),
      FieldSpec(4, "ratio", PType.Fixed32Float),
      FieldSpec(5, "ok", PType.Bool),
      FieldSpec(6, "name", PType.Str),
      FieldSpec(7, "payload", PType.Bytes)))
    val rows = Seq(
      Row(1L, -123456789L, 2.5, 0.5f, true, "naïve", Array[Byte](9, 8)),
      Row(2L, Long.MinValue + 1, -0.0, Float.NaN, false, "", Array.empty[Byte]),
      Row(3L, null, null, null, null, null, null))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), spec.sparkSchema)
    val dir = tmpDir() + "/pb"
    write(df, spec, dir)
    val back = read(spark, s"$dir/part-*.pb", spec).collect()
      .map(_.toSeq.map(canon)).sortBy(_.head.toString)
    val orig = rows.map(_.toSeq.map(canon)).sortBy(_.head.toString)
    // NaN needs value-equality, not ==
    assert(back.length == orig.length)
    back.zip(orig).foreach { case (b, o) =>
      b.zip(o).foreach {
        case (x: Float, y: Float) => assert(x.isNaN == y.isNaN && (x.isNaN || x == y))
        case (x, y) => assert(x == y, s"$x != $y")
      }
    }

    // forward compat: a reader descriptor missing field 7 and with an extra
    // field 9 still decodes the known fields and skips the unknown bytes
    val readerSpec = MessageSpec(Seq(
      FieldSpec(1, "id", PType.VarintLong, nullable = false),
      FieldSpec(6, "name", PType.Str),
      FieldSpec(9, "added_later", PType.VarintLong)))
    val partial = read(spark, s"$dir/part-*.pb", readerSpec).collect().sortBy(_.getLong(0))
    assert(partial.map(r => (r.get(0), r.get(1), r.get(2))).toSeq ==
      Seq((1L, "naïve", null), (2L, "", null), (3L, null, null)))
  }

  test("decompression transforms: gzip, bzip2, xz, zstd → csv decode") {
    val base = tmpDir()
    val df = graft.core.Tables(spark, sf(), "region").select("r_regionkey", "r_name")
    val plain = s"$base/plain"
    df.coalesce(1).write.option("header", "true").csv(plain)
    val src = new java.io.File(plain).listFiles().filter(_.getName.startsWith("part-")).head
    for (codec <- Seq("gz", "bzip2", "xz", "zstd")) {
      val cname = codec // CompressorStreamFactory names: gz, bzip2, xz, zstd
      val cdir = new java.io.File(s"$base/$codec"); cdir.mkdirs()
      Decompress.compressFile(src.getPath, s"$cdir/data.csv.$codec", cname)
      val back = Decompress.csv(spark, s"$cdir/data.csv.$codec", cname)
      assert(back.count() == df.count(), s"codec $cname row count")
      assert(back.select("r_name").collect().map(_.getString(0)).sorted.toSeq ==
        df.select("r_name").collect().map(_.getString(0)).sorted.toSeq, s"codec $cname content")
    }
  }

  test("charset transcode: legacy encodings decode losslessly, alone or under compression") {
    import org.apache.spark.sql.types._
    val base = tmpDir()
    val text = "café,1\nnaïve señor,2\nplain,3"
    val schema = StructType(Seq(StructField("s", StringType), StructField("n", IntegerType)))

    // ISO-8859-1 (would mojibake as UTF-8: é is a single 0xE9 byte)
    java.nio.file.Files.write(java.nio.file.Paths.get(base, "latin1.csv"),
      text.getBytes("ISO-8859-1"))
    val latin = Decompress.csv(spark, s"$base/latin1.csv", codec = "none",
      header = false, schema = Some(schema), charset = "ISO-8859-1")
    assert(latin.orderBy("n").select("s").collect().map(_.getString(0)).toSeq
      == Seq("café", "naïve señor", "plain"))
    // decoding the same bytes as UTF-8 must NOT silently produce the
    // right answer (proves the transcode is doing real work)
    val wrong = Decompress.csv(spark, s"$base/latin1.csv", codec = "none",
      header = false, schema = Some(schema), charset = "UTF-8")
    assert(wrong.orderBy("n").select("s").collect().map(_.getString(0)).toSeq
      != Seq("café", "naïve señor", "plain"))

    // UTF-16LE under gzip: transcode composes with decompression
    val u16 = java.nio.file.Paths.get(base, "u16.csv")
    java.nio.file.Files.write(u16, text.getBytes("UTF-16LE"))
    Decompress.compressFile(u16.toString, s"$base/u16.csv.gz", "gz")
    val back = Decompress.csv(spark, s"$base/u16.csv.gz", codec = "gz",
      header = false, schema = Some(schema), charset = "UTF-16LE")
    assert(back.orderBy("n").select("s").collect().map(_.getString(0)).toSeq
      == Seq("café", "naïve señor", "plain"))
  }

  test("fixed-width decode: offset slicing, pad-trim, empty-slice null idiom") {
    import graft.sources.FileSource
    val dir = tmpDir() + "/fw"
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("qty", DoubleType),
      StructField("flag", StringType)))
    // widths 6/8/3; row 2 has an all-blank qty slice → null; flag is
    // right-padded, numerics left-padded (copybook layout)
    val lines = Seq(
      "    42    3.25A  ",
      "     7        B  ",
      "123456    -0.5C  ")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "part-0.txt"),
      lines.mkString("\n").getBytes("UTF-8"))
    val back = FileSource.read(spark, FileSource.Format.FixedWidth(Seq(6, 8, 3)),
      Seq(s"$dir/part-0.txt"), Some(schema)).orderBy("id").collect()
    assert(back.map(r => (r.get(0), r.get(1), r.get(2))).toSeq == Seq(
      (7L, null, "B"), (42L, 3.25, "A"), (123456L, -0.5, "C")))
    // declared widths must cover every field
    intercept[IllegalArgumentException] {
      FileSource.read(spark, FileSource.Format.FixedWidth(Seq(6, 8)),
        Seq(s"$dir/part-0.txt"), Some(schema))
    }
  }

  test("xml decode: rowTag rows round-trip through Spark 4's built-in datasource") {
    import graft.sources.FileSource
    val dir = tmpDir() + "/xml"
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("s", StringType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, "héllo <&> world"), Row(2L, null)), 1),
      schema)
    df.write.mode("overwrite").format("xml").option("rowTag", "row").save(dir)
    val files = FileSource.discover(dir, "part-*").files.map(_.path)
    val back = FileSource.read(spark, FileSource.Format.Xml("row"), files, Some(schema))
      .orderBy("id").collect()
    assert(back.map(r => (r.get(0), r.get(1))).toSeq ==
      Seq((1L, "héllo <&> world"), (2L, null)))
  }
}
