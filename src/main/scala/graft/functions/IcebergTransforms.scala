package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** WRITE-side Iceberg spec bucket transform as a codegen'd kernel
  * (spec Appendix B: murmur3_x86_32 seed 0 over the value's single
  * serialization, `(hash & Int.MaxValue) % N`). The read-side
  * [[graft.sources.IcebergSource.bucketOf]] evaluates the same
  * function on driver-side literals for pruning; this expression
  * evaluates it per ROW inside whole-stage codegen so a bucket-
  * partitioned APPEND lays out data at scan speed — no UDF, no
  * boxing (the "(b) custom Expression beats UDF" rung, SURVEY §7.3).
  */
object IcebergTransformImpl {
  /** integral values (int/long/short/byte and date's epoch-day)
    * serialize as the 8-byte little-endian long — int and long agree
    * by construction (spec Appendix B). */
  def bucketLong(v: Long, n: Int): Int = {
    val b = new Array[Byte](8)
    var i = 0
    var x = v
    while (i < 8) { b(i) = (x & 0xff).toByte; x >>>= 8; i += 1 }
    (graft.sources.IcebergSource.murmur3(b) & Int.MaxValue) % n
  }

  /** strings serialize as their UTF-8 bytes. */
  def bucketString(s: UTF8String, n: Int): Int =
    (graft.sources.IcebergSource.murmur3(s.getBytes) & Int.MaxValue) % n
}

/** `graft_iceberg_bucket(col, N)` — per-row spec bucket. */
case class IcebergBucketExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, s"bucket count must be positive: $n")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_iceberg_bucket"

  override protected def nullSafeEval(v: Any): Any = child.dataType match {
    case LongType => IcebergTransformImpl.bucketLong(v.asInstanceOf[Long], n)
    case IntegerType | DateType => IcebergTransformImpl.bucketLong(v.asInstanceOf[Int].toLong, n)
    case ShortType => IcebergTransformImpl.bucketLong(v.asInstanceOf[Short].toLong, n)
    case ByteType => IcebergTransformImpl.bucketLong(v.asInstanceOf[Byte].toLong, n)
    case StringType => IcebergTransformImpl.bucketString(v.asInstanceOf[UTF8String], n)
    case other => throw graft.core.GraftError.Plan(
      s"iceberg bucket transform over unsupported type $other")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => child.dataType match {
      case LongType | IntegerType | DateType | ShortType | ByteType =>
        s"graft.functions.IcebergTransformImpl.bucketLong((long)$c, $n)"
      case StringType =>
        s"graft.functions.IcebergTransformImpl.bucketString($c, $n)"
      case other => throw graft.core.GraftError.Plan(
        s"iceberg bucket transform over unsupported type $other")
    })

  override protected def withNewChildInternal(c: Expression): IcebergBucketExpr = copy(child = c)
}

object IcebergTransformFunctions {
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_iceberg_bucket", exprs => IcebergBucketExpr(exprs(0),
        exprs(1).eval().asInstanceOf[Number].intValue()), "scala_udf")
}
