package graft

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.sources.ArrowIpcSource

/** Arrow IPC file-format codec conformance (cdf:
  * crates/cdf-format-arrow-ipc/). */
class ArrowIpcSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("l", LongType), StructField("i", IntegerType),
    StructField("d", DoubleType), StructField("f", FloatType),
    StructField("b", BooleanType), StructField("s", StringType),
    StructField("bin", BinaryType), StructField("dt", DateType),
    StructField("ts", TimestampType)))

  private def rows(n: Int): Seq[Row] = (0 until n).map { k =>
    if (k % 7 == 3) Row(null, null, null, null, null, null, null, null, null)
    else Row(k.toLong, k, k / 4.0, k / 2.0f, k % 2 == 0, s"v$k",
      Array[Byte](k.toByte, (k + 1).toByte),
      Date.valueOf(java.time.LocalDate.ofEpochDay(19000L + k)),
      {
        val t = new Timestamp(1700000000000L + k)
        t.setNanos(123456000); t
      })
  }

  test("full-lattice round-trip with nulls, multiple partitions and batches") {
    import scala.jdk.CollectionConverters._
    val dir = s"${tmpDir()}/arrow"
    val df = spark.createDataFrame(rows(1000).asJava, schema).repartition(4)
    val nFiles = ArrowIpcSource.write(df, dir, batchRows = 128)
    assert(nFiles == 4, "one IPC file per partition")

    val back = ArrowIpcSource.read(spark, s"$dir/part-*.arrow")
    assert(back.schema.fieldNames.toSeq == schema.fieldNames.toSeq)
    assert(back.rdd.getNumPartitions == 4, "one task per IPC file")

    val a = df.orderBy("l").collect().toSeq.map(_.toSeq.map {
      case b: Array[Byte] => b.toSeq; case x => x
    })
    val b = back.orderBy("l").collect().toSeq.map(_.toSeq.map {
      case b: Array[Byte] => b.toSeq; case x => x
    })
    assert(a == b, "bit-exact round-trip incl. micros timestamps and nulls")
  }

  test("schema inference from the IPC footer matches the declared schema") {
    import scala.jdk.CollectionConverters._
    val dir = s"${tmpDir()}/arrow"
    ArrowIpcSource.write(spark.createDataFrame(rows(10).asJava, schema), dir)
    val st = ArrowIpcSource.read(spark, s"$dir/part-*.arrow").schema
    assert(st.fields.map(f => (f.name, f.dataType)).toSeq
      == schema.fields.map(f => (f.name, f.dataType)).toSeq)
  }
}
