package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Learned BPE merge list in application order: merge m rewrites the
  * adjacent symbol pair (a(m), b(m)) to ab(m). Shipped into executors
  * as a plan reference object (the broadcast-small-table pattern —
  * a merge list is O(vocab-budget), kilobytes even for a 64k vocab). */
final class BpeTable(
    val a: Array[String], val b: Array[String], val ab: Array[String])
  extends Serializable {
  require(a.length == b.length && b.length == ab.length, "ragged merge table")
  def size: Int = a.length
}

object BpeTable {
  /** From (pair "x y", merged "xy") rows in merge-priority order. */
  def fromPairs(pairs: Seq[(String, String)]): BpeTable = {
    val parts = pairs.map { case (p, m) =>
      val i = p.indexOf(' ')
      require(i > 0 && i < p.length - 1, s"malformed pair '$p'")
      (p.substring(0, i), p.substring(i + 1), m)
    }
    new BpeTable(parts.map(_._1).toArray, parts.map(_._2).toArray,
      parts.map(_._3).toArray)
  }
}

/** Greedy BPE tokenizer APPLY — one pass per learned merge over the
  * word's symbol sequence, in merge-priority order (Sennrich et al.
  * 2016; the apply step of q_bpe_merges' induction).
  *
  * MERGE-PASS SEMANTICS: exactly the engines' sentinel-space
  * left-to-right non-overlapping `replace(sym, " a b ", " ab ")` that
  * the induction itself rewrites with — after a match, the trailing
  * space is CONSUMED, so the token immediately after a merge cannot
  * start the next match of the same pass. Self-consistent with
  * q_bpe_merges, and replayable bit-for-bit by a SQL oracle as k
  * sequential `replace` calls. (A linked-list L2R apply would re-pair
  * the merged token with its successor within the same pass — a
  * different, equally valid convention; this one is the one the
  * induction's own rewrite defines.)
  */
object BpeImpl {

  /** Codepoint split (DuckDB regexp_replace '(.)' and Java regex '.'
    * both operate per codepoint). */
  def chars(word: String): Array[String] = {
    val out = new Array[String](word.codePointCount(0, word.length))
    var i = 0
    var k = 0
    while (i < word.length) {
      val l = Character.charCount(word.codePointAt(i))
      out(k) = word.substring(i, i + l)
      k += 1
      i += l
    }
    out
  }

  /** One merge pass; see the object doc for the exact semantics. */
  def mergePass(ts: Array[String], a: String, b: String, ab: String): Array[String] = {
    val out = new Array[String](ts.length)
    var o = 0
    var i = 0
    var blocked = false // token right after a merge: its leading space was consumed
    while (i < ts.length) {
      if (!blocked && i + 1 < ts.length && ts(i) == a && ts(i + 1) == b) {
        out(o) = ab; o += 1; i += 2; blocked = true
      } else {
        out(o) = ts(i); o += 1; i += 1; blocked = false
      }
    }
    if (o == ts.length) ts else java.util.Arrays.copyOf(out, o)
  }

  def encode(word: String, t: BpeTable): Array[String] = {
    var toks = chars(word)
    var m = 0
    while (m < t.size && toks.length >= 2) {
      toks = mergePass(toks, t.a(m), t.b(m), t.ab(m))
      m += 1
    }
    toks
  }

  // Per-thread word→token-count memo for the whole-document count path:
  // corpora are Zipf-distributed, so the hit rate is near-total and the
  // encode cost converges to a hash probe per word. Keyed by table
  // IDENTITY (a re-plan ships a fresh BpeTable instance → clear).
  private final class Memo {
    var table: BpeTable = _
    val m = new java.util.HashMap[String, Integer](1 << 16)
  }
  private val memoLocal = new ThreadLocal[Memo] {
    override def initialValue(): Memo = new Memo
  }
  private final val MemoCap = 1 << 18

  /** Token count of a whole document: split on single spaces (the
    * engines' `split(text, ' ')` grain), encode each non-empty word,
    * sum. */
  def countDoc(text: UTF8String, t: BpeTable): Long = {
    val s = text.toString
    val memo = memoLocal.get()
    if (memo.table ne t) { memo.m.clear(); memo.table = t }
    var total = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val j = s.indexOf(' ', i)
      val end = if (j < 0) n else j
      if (end > i) {
        val w = s.substring(i, end)
        val cached = memo.m.get(w)
        if (cached != null) total += cached.longValue()
        else {
          val k = encode(w, t).length
          if (memo.m.size < MemoCap) memo.m.put(w, Integer.valueOf(k))
          total += k
        }
      }
      i = end + 1
    }
    total
  }
}

/** `graft_bpe_tokens(word)` — the learned tokenizer applied to one
  * word, emitting the token array. Array output keeps it on the
  * interpreted path (CodegenFallback) — it is applied to the O(vocab)
  * word-frequency table, never the corpus. */
case class BpeTokensExpr(child: Expression, table: BpeTable)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_tokens"
  override protected def nullSafeEval(v: Any): Any = {
    val toks = BpeImpl.encode(v.asInstanceOf[UTF8String].toString, table)
    val out = new Array[Any](toks.length)
    var i = 0
    while (i < toks.length) { out(i) = UTF8String.fromString(toks(i)); i += 1 }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): BpeTokensExpr =
    copy(child = c)
}

/** `graft_bpe_count(text)` — whole-document token count under the
  * learned tokenizer; scalar output, fully codegen'd (the merge table
  * rides the plan as a reference object). The corpus-scale map pass a
  * training pipeline benchmarks as tokens/s. */
case class BpeCountExpr(child: Expression, table: BpeTable) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bpe_count"
  override protected def nullSafeEval(v: Any): Any =
    BpeImpl.countDoc(v.asInstanceOf[UTF8String], table)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", table, classOf[BpeTable].getName)
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeImpl.countDoc($c, $ref)")
  }
  override protected def withNewChildInternal(c: Expression): BpeCountExpr =
    copy(child = c)
}
