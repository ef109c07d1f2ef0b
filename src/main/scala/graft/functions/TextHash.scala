package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass text-hash kernels, exposed to codegen via the static
  * forwarders of this object (custom Catalyst Expressions below).
  *
  * The HOF formulations (TextDedup.simhashOfHashes / minhashSignature)
  * express the same math but are interpreted and make k passes over the
  * token/shingle array; these kernels make ONE pass and live inside
  * whole-stage codegen — the "(b) custom Expression beats UDF" rung of
  * the extension ladder (SURVEY §7.3; cf. cdf's vectorized kernels in
  * crates/cdf-expression/).
  */
object TextHashImpl {
  final val Seed = 42L

  /** 2^61 − 1, the Mersenne modulus of the table-checksum fold. */
  final val Mersenne61 = 2305843009213693951L

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** md5(bytes) digest bytes 8..15 little-endian (= DuckDB
    * `md5_number_lower`'s uint64) mod 2^61−1. One digest, one 8-byte
    * read, one unsigned remainder per row; the ThreadLocal digest is
    * reused across the whole codegen'd partition loop. */
  def md5Low64Mod61(s: UTF8String): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var u = 0L
    var j = 15
    while (j >= 8) { u = (u << 8) | (d(j) & 0xffL); j -= 1 }
    java.lang.Long.remainderUnsigned(u, Mersenne61)
  }

  /** xxhash64 of a token's UTF-8 bytes. */
  def hashToken(s: UTF8String): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, Seed)

  /** 64-bit SimHash over whitespace tokens of `text`, one pass. */
  def simhash64(text: UTF8String): Long = {
    val counts = new Array[Int](64)
    val s = text.toString
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && Character.isWhitespace(s.charAt(i))) i += 1
      val start = i
      while (i < n && !Character.isWhitespace(s.charAt(i))) i += 1
      if (i > start) {
        val h = hashToken(UTF8String.fromString(s.substring(start, i)))
        var b = 0
        while (b < 64) {
          counts(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
      }
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** One-pass PORTABLE SimHash: the per-token hash is the first 8
    * bytes of md5(token) as a big-endian long — bit-identical to the
    * HOF formulation `simhashOfHashes(portableTokenHashes(c))` (the
    * first 16 hex chars parsed as two 32-bit halves ARE the first 8
    * digest bytes big-endian), which is what lets the DuckDB oracle
    * replay the whole q_simhash pipeline in SQL. Tokenization
    * replicates `split(trim(s), "\\s+")` exactly (String.split with
    * the same regex), so kernel and HOF agree on every corpus. */
  def portableSimhash64(text: UTF8String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val counts = new Array[Int](64)
    val toks = text.toString.trim.split("\\s+")
    var t = 0
    while (t < toks.length) {
      md.reset()
      val d = md.digest(toks(t).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var h = 0L
      var j = 0
      while (j < 8) { h = (h << 8) | (d(j) & 0xffL); j += 1 }
      var b = 0
      while (b < 64) {
        counts(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
      t += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** Distinct word n-grams (space-joined) in one pass — the shingle
    * builder (set-equal to TextAnalysis.wordNgrams; first-occurrence
    * order). */
  def wordNgrams(text: UTF8String, n: Int): ArrayData = {
    val s = text.toString.trim
    if (s.isEmpty) return new GenericArrayData(Array.empty[Any])
    val words = s.split("\\s+")
    if (words.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    val sb = new java.lang.StringBuilder(64)
    while (i + n <= words.length) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var k2 = 0
    while (it.hasNext) { out(k2) = UTF8String.fromString(it.next()); k2 += 1 }
    new GenericArrayData(out)
  }

  /** k-element MinHash signature over a string array, one pass:
    * element i = min over values of mix(xxhash64(value), i). */
  def minhashSignature(arr: ArrayData, k: Int): ArrayData = {
    val mins = Array.fill[Long](k)(Long.MaxValue)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val base = hashToken(arr.getUTF8String(j))
        var i = 0
        while (i < k) {
          val h = XXH64.hashLong(i.toLong, base) // per-function remix
          if (h < mins(i)) mins(i) = h
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(mins)
  }
}

/** `graft_md5low64_mod61(text)` — md5 of the UTF-8 bytes, digest bytes
  * 8..15 read little-endian as an unsigned 64-bit integer (exactly
  * DuckDB's `md5_number_lower`), reduced mod 2^61−1. Because the
  * Mersenne modulus is applied PER ROW and mod is sum-homomorphic
  * ((Σxᵢ) mod p = (Σ(xᵢ mod p)) mod p), a decimal SUM of these values
  * followed by one final pmod reproduces `SUM(md5_number_lower(..))
  * % p` bit-exactly — without the 8× `conv(substring(hex))` decimal
  * chain the first formulation paid per row. */
case class Md5Low64Mod61Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_md5low64_mod61"
  override protected def nullSafeEval(v: Any): Any =
    TextHashImpl.md5Low64Mod61(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashImpl.md5Low64Mod61($c)")
  override protected def withNewChildInternal(c: Expression): Md5Low64Mod61Expr = copy(child = c)
}

/** `simhash64_native(text)` — codegen'd one-pass SimHash. */
case class SimHash64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"
  override protected def nullSafeEval(v: Any): Any =
    TextHashImpl.simhash64(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashImpl.simhash64($c)")
  override protected def withNewChildInternal(c: Expression): SimHash64Expr = copy(child = c)
}

/** `graft_portable_simhash64(text)` — codegen'd one-pass portable
  * (md5-lane) SimHash; see [[TextHashImpl.portableSimhash64]]. */
case class PortableSimHash64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_portable_simhash64"
  override protected def nullSafeEval(v: Any): Any =
    TextHashImpl.portableSimhash64(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashImpl.portableSimhash64($c)")
  override protected def withNewChildInternal(c: Expression): PortableSimHash64Expr = copy(child = c)
}

/** `graft_minhash(array<string>, k)` — one-pass k-min signature.
  * Array-building output keeps it on the interpreted path
  * (CodegenFallback), but the single pass still replaces k HOF scans. */
case class MinHashSigExpr(child: Expression, k: Int) extends UnaryExpression
    with CodegenFallback {
  require(k > 0 && k <= 512, s"minhash k out of range: $k")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"
  override def nullable: Boolean = child.nullable
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else TextHashImpl.minhashSignature(v.asInstanceOf[ArrayData], k)
  }
  override protected def withNewChildInternal(c: Expression): MinHashSigExpr = copy(child = c)
}

/** `graft_ngrams(text, n)` — one-pass distinct word-n-gram shingles. */
case class WordNgramsExpr(child: Expression, n: Int) extends UnaryExpression
    with CodegenFallback {
  require(n > 0)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_ngrams"
  override protected def nullSafeEval(v: Any): Any =
    TextHashImpl.wordNgrams(v.asInstanceOf[UTF8String], n)
  override protected def withNewChildInternal(c: Expression): WordNgramsExpr = copy(child = c)
}

/** Registration + Column access for the native expressions. */
object TextHashFunctions {
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_simhash64", exprs => SimHash64Expr(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_portable_simhash64", exprs => PortableSimHash64Expr(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_minhash16", exprs => MinHashSigExpr(exprs.head, 16), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_ngrams5", exprs => WordNgramsExpr(exprs.head, 5), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_md5low64_mod61", exprs => Md5Low64Mod61Expr(exprs.head), "scala_udf")
  }
}
