package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}

/** Builds a DECODED in-memory `ColumnarBatch` (plain on-heap vectors,
  * no parquet, no compression, no CachedBatch codec) from a DataFrame
  * projection — the fixture for kernel-only microcells. The reference's
  * 3–7 GB/s/core validation kernels run over already-decoded columnar
  * memory; timing our kernels over anything that re-decodes per pass
  * (the r8 CachedBatch cache, a parquet scan) measures the codec, not
  * the kernel. Driver-side and bounded by construction: callers hand a
  * single benchmark split, never a production table. */
object KernelFixture {

  def onHeapBatch(df: DataFrame, cols: Seq[String]): (ColumnarBatch, StructType) = {
    val proj = df.select(cols.map(org.apache.spark.sql.functions.col): _*)
    val schema = proj.schema
    val rows = proj.collect()
    val n = rows.length
    val vecs = OnHeapColumnVector.allocateColumns(n, schema)
    var i = 0
    while (i < n) {
      val row = rows(i)
      var c = 0
      while (c < schema.length) {
        val v = vecs(c)
        if (row.isNullAt(c)) v.putNull(i)
        else schema(c).dataType match {
          case LongType => v.putLong(i, row.getLong(c))
          case IntegerType => v.putInt(i, row.getInt(c))
          case ShortType => v.putShort(i, row.getShort(c))
          case ByteType => v.putByte(i, row.getByte(c))
          case DoubleType => v.putDouble(i, row.getDouble(c))
          case FloatType => v.putFloat(i, row.getFloat(c))
          case BooleanType => v.putBoolean(i, row.getBoolean(c))
          case StringType =>
            val b = row.getString(c).getBytes(java.nio.charset.StandardCharsets.UTF_8)
            v.putByteArray(i, b)
          case TimestampType =>
            v.putLong(i, DateTimeUtils.fromJavaTimestamp(row.getAs[java.sql.Timestamp](c)))
          case TimestampNTZType =>
            v.putLong(i, DateTimeUtils.localDateTimeToMicros(row.getAs[java.time.LocalDateTime](c)))
          case DateType =>
            v.putInt(i, DateTimeUtils.fromJavaDate(row.getAs[java.sql.Date](c)))
          case other =>
            throw new IllegalArgumentException(s"KernelFixture: unsupported type $other")
        }
        c += 1
      }
      i += 1
    }
    (new ColumnarBatch(vecs.asInstanceOf[Array[ColumnVector]], n), schema)
  }
}
