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

/** Random-hyperplane LSH bucket in ONE loop per row — bit-identical to
  * the HOF formulation in `Similarity.lshBucket` / `lshBucketLcg`
  * (differential-tested): bit j = sign of the in-order f64 fold of
  * xᵢ · plane(j, i), planes derived per `scheme`:
  *  - "xxh": Spark's own chained xxhash64 over the INT pair
  *    (j + offset, i), low 20 bits mapped into (−0.5, 0.5) — matches
  *    `xxhash64(j + planeOffset, i) & 1048575 / 1048576.0 − 0.5`.
  *  - "lcg": exact integer Weyl/LCG recurrence on (j·D + i + 1) —
  *    the engine-portable plane family the DuckDB oracles replay.
  * Null law mirrors the HOF: a null element nulls that plane's fold,
  * and `when(proj > 0, …)` maps a null projection to bit 0. */
case class LshBucketExpr(emb: Expression, planeOffset: Expression,
    numPlanes: Int, scheme: String)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with CodegenFallback {
  require(scheme == "xxh" || scheme == "lcg", s"unknown plane scheme $scheme")

  override def left: Expression = emb
  override def right: Expression = planeOffset
  override def dataType: DataType = LongType
  override def prettyName: String = s"graft_lsh_bucket_$scheme"

  private lazy val elemIsFloat: Boolean = emb.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(s"LshBucketExpr over $other")
  }
  /** The HOF chain `xxhash64(j + planeOffset, i)` hashes its first arg
    * with hashInt when planeOffset is INT-typed but hashLong when it is
    * LONG-typed (j + offset widens) — the kernel must branch the same
    * way or the bit-identical claim silently breaks for long offsets. */
  private lazy val offsetIsLong: Boolean = planeOffset.dataType match {
    case IntegerType => false
    case LongType => true
    case other => throw new IllegalArgumentException(
      s"LshBucketExpr planeOffset must be INT or BIGINT, got $other")
  }

  override def nullSafeEval(e: Any, off: Any): Any = {
    val arr = e.asInstanceOf[ArrayData]
    val offset: Long = off match {
      case i: java.lang.Integer => i.intValue.toLong
      case l: java.lang.Long => l.longValue
    }
    val d = arr.numElements()
    var bucket = 0L
    var j = 0
    while (j < numPlanes) {
      var proj = 0.0
      var nullProj = false
      var i = 0
      while (i < d && !nullProj) {
        if (arr.isNullAt(i)) nullProj = true
        else {
          val x = if (elemIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
          val plane =
            if (scheme == "xxh") {
              import org.apache.spark.sql.catalyst.expressions.XXH64
              val h1 =
                if (offsetIsLong) XXH64.hashLong(j + offset, 42L)
                else XXH64.hashInt((j + offset).toInt, 42L)
              val h = XXH64.hashInt(i, h1)
              (h & 1048575L).toDouble / 1048576.0 - 0.5
            } else {
              val h = ((j.toLong * d + i + 1L) * 2654435761L) % 2147483648L
              h.toDouble / 2147483648.0 - 0.5
            }
          proj += x * plane
          i += 1
        }
      }
      if (!nullProj && proj > 0) bucket |= 1L << j
      j += 1
    }
    bucket
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): LshBucketExpr = copy(emb = newLeft, planeOffset = newRight)
}

/** max over a plan-time-constant reference suite of
  * round(cos(v, refᵢ), 4) — the semantic-decontamination score in ONE
  * pass per row. Bit-identical to the crossJoin + round + groupBy.max
  * formulation: the same in-order dot folds, the same association
  * `dot / (nrm_v * nrm_ref)`, the same HALF_UP 4-decimal round per
  * reference, then max. The suite (refs + their norms) ships in the
  * serialized expression like a broadcast codebook; the operator
  * becomes a narrow map stage — no row explosion, no shuffle. */
case class MaxCosineExpr(child: Expression, refs: Array[Array[Double]])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_max_cosine"

  private lazy val elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(s"MaxCosineExpr over $other")
  }
  private lazy val refNorms: Array[Double] = refs.map { r =>
    var acc = 0.0; var i = 0
    while (i < r.length) { acc += r(i) * r(i); i += 1 }
    math.sqrt(acc)
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val d = arr.numElements()
    val v = new Array[Double](d)
    var i = 0
    while (i < d) {
      // a null element nulls EVERY ref's dot (the HOF fold absorbs it),
      // so max over all-null cosines is null — same as the join path
      if (arr.isNullAt(i)) return null
      v(i) = if (elemIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      i += 1
    }
    var selfDot = 0.0
    i = 0
    while (i < d) { selfDot += v(i) * v(i); i += 1 }
    val nrmV = math.sqrt(selfDot)
    var best = 0.0
    var any = false
    var r = 0
    while (r < refs.length) {
      val ref = refs(r)
      // dimension mismatch → zip_with pads with null → null dot → null
      // cos, which max() skips (exactly the join formulation's law)
      val denom = nrmV * refNorms(r)
      // Spark's (non-ANSI) Divide and DuckDB both return NULL on a
      // zero divisor — a zero-norm vector or ref contributes a null
      // cosine that max() skips, it neither NaNs nor throws
      if (ref.length == d && denom != 0.0) {
        var dot = 0.0
        var j = 0
        while (j < d) { dot += v(j) * ref(j); j += 1 }
        val cos = dot / denom
        // Spark round(_, 4): BigDecimal HALF_UP on finite values; NaN
        // and ±Infinity pass through untouched (Round special-cases
        // them — BigDecimal.valueOf(NaN) would throw)
        val rounded =
          if (java.lang.Double.isNaN(cos) || java.lang.Double.isInfinite(cos)) cos
          else java.math.BigDecimal.valueOf(cos)
            .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
        // max() orders doubles Spark-style (NaN greatest, -0.0 < 0.0)
        // = java.lang.Double.compare — a bare `>` would drop NaN
        if (!any || java.lang.Double.compare(rounded, best) > 0) {
          best = rounded; any = true
        }
      }
      r += 1
    }
    if (!any) null else best
  }

  override protected def withNewChildInternal(newChild: Expression): MaxCosineExpr =
    copy(child = newChild)
}

object VectorKernels {
  /** Registers `graft_max_cosine` bound to THIS reference suite
    * (plan-time constant — the broadcast-eval-suite analogue). */
  def maxCosine(spark: org.apache.spark.sql.SparkSession,
      emb: Column, refs: Array[Array[Double]]): Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_max_cosine", exprs => MaxCosineExpr(exprs.head, refs), "scala_udf")
    org.apache.spark.sql.functions.call_function("graft_max_cosine", emb)
  }

  /** Registers `graft_dot` (idempotent) and builds the call. */
  def dot(spark: org.apache.spark.sql.SparkSession, a: Column, b: Column): Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", exprs => DotProductExpr(exprs(0), exprs(1)), "scala_udf")
    org.apache.spark.sql.functions.call_function("graft_dot", a, b)
  }

  /** Registers + calls the xxhash64-plane bucket kernel. */
  def lshBucketXxh(spark: org.apache.spark.sql.SparkSession,
      emb: Column, numPlanes: Int, planeOffset: Column): Column = {
    val fn = s"graft_lsh_bucket_xxh_$numPlanes"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      fn, exprs => LshBucketExpr(exprs(0), exprs(1), numPlanes, "xxh"), "scala_udf")
    org.apache.spark.sql.functions.call_function(fn, emb, planeOffset)
  }

  /** Registers + calls the LCG-plane (oracle-portable) bucket kernel. */
  def lshBucketLcg(spark: org.apache.spark.sql.SparkSession,
      emb: Column, numPlanes: Int): Column = {
    val fn = s"graft_lsh_bucket_lcg_$numPlanes"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      fn, exprs => LshBucketExpr(exprs(0), exprs(1), numPlanes, "lcg"), "scala_udf")
    org.apache.spark.sql.functions.call_function(fn, emb,
      org.apache.spark.sql.functions.lit(0L))
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
