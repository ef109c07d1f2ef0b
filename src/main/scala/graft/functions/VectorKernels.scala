package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Vector kernels for the IVF similarity path (SURVEY §2.11 rung (b):
  * custom Expression beats UDF; cf. the codegen'd kernels in TextHash).
  *
  * `NearestCentroidExpr` assigns an embedding to its nearest coarse
  * centroid (squared L2, ties to the lower index) in ONE tight JVM
  * loop per row — the HOF formulation would interpret k×d expression
  * nodes per row. The centroid table is a plan-time constant shipped
  * in the serialized expression (k·d doubles — a few KB), exactly like
  * a broadcast codebook.
  */
case class NearestCentroidExpr(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType

  private lazy val elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(s"NearestCentroidExpr over $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val d = arr.numElements()
    var best = -1
    var bestDist = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val cen = centroids(c)
      var dist = 0.0
      var i = 0
      val n = math.min(d, cen.length)
      while (i < n) {
        val x = if (elemIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        val diff = x - cen(i)
        dist += diff * diff
        i += 1
      }
      if (dist < bestDist) { bestDist = dist; best = c }
      c += 1
    }
    best
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroidExpr =
    copy(child = newChild)
}

object VectorKernels {
  /** Registers `graft_nearest_centroid` bound to THIS centroid table
    * (plan-time constant), then builds the call — the same temp-function
    * pattern as TextHashFunctions. */
  def nearestCentroid(spark: org.apache.spark.sql.SparkSession,
      emb: Column, centroids: Array[Array[Double]]): Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_nearest_centroid",
      exprs => NearestCentroidExpr(exprs.head, centroids), "scala_udf")
    org.apache.spark.sql.functions.call_function("graft_nearest_centroid", emb)
  }
}
