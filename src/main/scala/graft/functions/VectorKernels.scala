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

/** PRODUCT-QUANTIZATION encode: the vector splits into `m` contiguous
  * subspaces and each subvector maps to its nearest per-subspace code
  * (squared L2, ties to the lower index) — one tight loop per row over
  * a plan-time-constant codebook `codebooks(sub)(code)(dim)`, the PQ
  * half of a faiss-style IVF-PQ index. Returns array<int> of length m. */
case class PqEncodeExpr(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  private lazy val elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(s"PqEncodeExpr over $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = codebooks.length
    val out = new Array[Int](m)
    var sub = 0
    var off = 0
    while (sub < m) {
      val codes = codebooks(sub)
      val dSub = if (codes.isEmpty) 0 else codes(0).length
      var best = -1
      var bestDist = Double.MaxValue
      var c = 0
      while (c < codes.length) {
        val code = codes(c)
        var dist = 0.0
        var i = 0
        val n = math.min(dSub, math.max(0, arr.numElements() - off))
        while (i < n) {
          val x = if (elemIsFloat) arr.getFloat(off + i).toDouble else arr.getDouble(off + i)
          val diff = x - code(i)
          dist += diff * diff
          i += 1
        }
        if (dist < bestDist) { bestDist = dist; best = c }
        c += 1
      }
      out(sub) = best
      off += dSub
      sub += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncodeExpr =
    copy(child = newChild)
}

/** Σ aᵢ·bᵢ in ONE tight loop per row — bit-identical to the HOF
  * formulation `aggregate(zip_with(a,b,_*_), 0.0, _+_)` (same in-order
  * f64 adds, floats widened before the product), but without
  * interpreting 3 lambda nodes and allocating a product array per row.
  * Null law mirrors the HOF exactly: null array → null, any null
  * element → null, length mismatch → null (zip_with pads with null and
  * the fold absorbs it). */
case class DotProductExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(s"DotProductExpr over $other")
  }
  private lazy val leftFloat = isFloat(left)
  private lazy val rightFloat = isFloat(right)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (leftFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rightFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotProductExpr = copy(left = newLeft, right = newRight)
}

object VectorKernels {
  /** Registers `graft_dot` (idempotent) and builds the call. */
  def dot(spark: org.apache.spark.sql.SparkSession, a: Column, b: Column): Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", exprs => DotProductExpr(exprs(0), exprs(1)), "scala_udf")
    org.apache.spark.sql.functions.call_function("graft_dot", a, b)
  }

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

  /** Registers `graft_pq_encode` bound to THIS codebook (plan-time
    * constant — m·k·dSub doubles, a broadcast-codebook analogue). */
  def pqEncode(spark: org.apache.spark.sql.SparkSession,
      emb: Column, codebooks: Array[Array[Array[Double]]]): Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_pq_encode",
      exprs => PqEncodeExpr(exprs.head, codebooks), "scala_udf")
    org.apache.spark.sql.functions.call_function("graft_pq_encode", emb)
  }
}
