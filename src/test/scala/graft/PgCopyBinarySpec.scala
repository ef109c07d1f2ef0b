package graft

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => ScTest}

import graft.sources.PgCopyBinary

/** COPY BINARY wire-format conformance (public PostgreSQL binary
  * format; cdf: crates/cdf-dest-postgres/src/commit.rs:678-943). */
class PgCopyBinarySpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("l", LongType), StructField("i", IntegerType),
    StructField("d", DoubleType), StructField("b", BooleanType),
    StructField("s", StringType), StructField("bin", BinaryType),
    StructField("dt", DateType), StructField("ts", TimestampType),
    StructField("num", DecimalType(18, 4))))

  private def rows(n: Int): Seq[Row] = (0 until n).map { k =>
    if (k % 5 == 2) Row(null, null, null, null, null, null, null, null, null)
    else Row(k.toLong * 1000003, k, k / 8.0, k % 2 == 0, s"série-$k",
      Array[Byte](k.toByte), Date.valueOf(java.time.LocalDate.of(2024, 1, 1 + k % 28)),
      new Timestamp(1700000000000L + k * 1000L),
      new java.math.BigDecimal(s"${if (k % 2 == 0) "-" else ""}$k${k % 10}.${1000 + k % 9000}"))
  }

  test("stream header/trailer are the wire format's exact bytes") {
    val bytes = PgCopyBinary.encodeStream(Iterator.empty, schema)
    // 11-byte signature + flags(0) + extension(0) + trailer(-1)
    assert(bytes.length == 11 + 4 + 4 + 2)
    assert(bytes.take(6).map(_.toChar).mkString == "PGCOPY")
    assert((bytes(6), bytes(7), bytes(8), bytes(9), bytes(10))
      == (('\n'.toByte, 0xFF.toByte, '\r'.toByte, '\n'.toByte, 0x00.toByte)))
    assert(bytes.takeRight(2).toSeq == Seq(0xFF.toByte, 0xFF.toByte))
  }

  test("full-lattice round-trip with nulls, distributed per-partition streams") {
    import scala.jdk.CollectionConverters._
    val dir = s"${tmpDir()}/pgcopy"
    val df = spark.createDataFrame(rows(500).asJava, schema).repartition(4)
    assert(PgCopyBinary.write(df, dir) == 4)
    val back = PgCopyBinary.read(spark, s"$dir/part-*.pgcopy", schema)
    def canon(r: Row) = r.toSeq.map {
      case b: Array[Byte] => b.toSeq
      case x => x
    }
    assert(back.orderBy("l").collect().toSeq.map(canon)
      == df.orderBy("l").collect().toSeq.map(canon))
  }

  test("NUMERIC base-10000 encoding round-trips digit-exact (property)") {
    val decimals = for {
      unscaled <- Gen.chooseNum(Long.MinValue / 2, Long.MaxValue / 2)
      scale <- Gen.chooseNum(0, 10)
    } yield new java.math.BigDecimal(java.math.BigInteger.valueOf(unscaled), scale)
    val prop = Prop.forAll(decimals) { d =>
      val decoded = PgCopyBinary.decodeNumeric(PgCopyBinary.encodeNumeric(d))
      decoded.compareTo(d) == 0 && decoded.scale() == math.max(d.scale(), 0)
    }
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
    // the documented corner cases
    for (s <- Seq("0", "0.0000", "-0.0001", "10000", "99999999.9999",
        "-123456789.5", "0.00005", "120000", "1", "9999")) {
      val d = new java.math.BigDecimal(s)
      assert(PgCopyBinary.decodeNumeric(PgCopyBinary.encodeNumeric(d)).compareTo(d) == 0, s)
    }
  }

  test("a lineitem slice survives the wire digit-exact (decimal-fidelity law)") {
    val li = graft.core.Tables(spark, sf("sf0.001"), "lineitem")
      .selectExpr("l_orderkey", "CAST(l_quantity AS DECIMAL(12,2)) AS l_quantity",
        "l_returnflag")
    val dir = s"${tmpDir()}/li"
    PgCopyBinary.write(li, dir)
    val back = PgCopyBinary.read(spark, s"$dir/part-*.pgcopy", li.schema)
    assert(graft.pkg.PackageWriter.contentHash(back)
      == graft.pkg.PackageWriter.contentHash(li))
  }
}
