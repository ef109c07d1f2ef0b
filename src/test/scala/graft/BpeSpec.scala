package graft

import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{BpeImpl, BpeTable}

/** Laws for the BPE apply kernel: the token-array merge pass must be
  * EXACTLY the engines' sentinel-space string replace (the semantics
  * the DuckDB oracle replays), and the whole-document count must equal
  * the per-word token arrays summed. */
class BpeSpec extends SparkSpec {

  /** Reference formulation: the literal string machinery both engines
    * run — char-space the word, replace " a b " → " ab " per merge,
    * split. */
  private def refEncode(word: String, merges: Seq[(String, String)]): Seq[String] = {
    var sym = " " + word.codePoints().toArray
      .map(cp => new String(Character.toChars(cp)) + " ").mkString
    merges.foreach { case (pair, merged) =>
      sym = sym.replace(s" $pair ", s" $merged ")
    }
    sym.trim.split(" ").toSeq.filter(_.nonEmpty)
  }

  test("merge pass == sentinel-space string replace, randomized differential") {
    val rnd = new scala.util.Random(7)
    val alphabet = "abc"
    // adversarial merge lists over a tiny alphabet: chained merges
    // (ab + ab,a), overlapping anchors (a,a), merged-symbol reuse
    val mergeLists = Seq(
      Seq(("a b", "ab")),
      Seq(("a a", "aa")),
      Seq(("a b", "ab"), ("ab a", "aba")),
      Seq(("a a", "aa"), ("aa a", "aaa")),
      Seq(("b b", "bb"), ("a bb", "abb"), ("abb c", "abbc")))
    for (ml <- mergeLists; _ <- 1 to 400) {
      val word = (1 to (1 + rnd.nextInt(12)))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      val table = BpeTable.fromPairs(ml)
      val got = BpeImpl.encode(word, table).toSeq
      val want = refEncode(word, ml)
      assert(got == want, s"word '$word' merges $ml: got $got want $want")
      assert(got.mkString == word, s"tokens must respell the word: $got")
    }
  }

  test("known tricky cases: consumed sentinel blocks the following token") {
    val t = BpeTable.fromPairs(Seq(("a b", "ab")))
    // " b a b a b ": the replace consumes the space after the first
    // match, so the second (a,b) adjacency does NOT merge in this pass
    assert(BpeImpl.encode("babab", t).toSeq == Seq("b", "ab", "a", "b"))
    assert(BpeImpl.encode("abab", t).toSeq == Seq("ab", "a", "b"))
    assert(BpeImpl.encode("xab", t).toSeq == Seq("x", "ab"))
    assert(BpeImpl.encode("ab", t).toSeq == Seq("ab"))
    assert(BpeImpl.encode("a", t).toSeq == Seq("a"))
  }

  test("countDoc == per-word encode lengths summed (space grain, empties skipped)") {
    val t = BpeTable.fromPairs(Seq(("a b", "ab"), ("ab c", "abc")))
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 200) {
      val words = (0 to rnd.nextInt(8)).map { _ =>
        (1 to (1 + rnd.nextInt(6))).map(_ => "abc"(rnd.nextInt(3))).mkString
      }
      // inject double spaces / leading / trailing to hit empty segments
      val doc = "  " + words.mkString(if (rnd.nextBoolean()) " " else "  ") + " "
      val want = doc.split(" ").filter(_.nonEmpty)
        .map(w => BpeImpl.encode(w, t).length.toLong).sum
      assert(BpeImpl.countDoc(UTF8String.fromString(doc), t) == want, s"doc '$doc'")
    }
  }

  test("q_bpe_encode frequencies: corpus token mass is conserved") {
    import org.apache.spark.sql.functions._
    // Σ cnt over the token table == Σ per-word (tokens × freq) == the
    // corpus's total symbol mass after merges; also every token
    // respells into the vocabulary (chars + merged symbols)
    val out = graft.catalog.TokenizerQueries.bpeEncode.run(spark, sf()).collect()
    assert(out.length > 5)
    val totalFromTable = out.map(_.getLong(1)).sum
    val docs = graft.core.Tables(spark, sf(), "documents")
    val table = graft.catalog.TokenizerQueries.learnedTable(spark, sf())
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bpe_count_t",
      exprs => graft.functions.BpeCountExpr(exprs.head, table), "scala_udf")
    val totalFromCount = docs
      .select(call_function("graft_bpe_count_t", col("text")).as("k"))
      .agg(sum("k")).head().getLong(0)
    assert(totalFromTable == totalFromCount,
      s"token-frequency mass $totalFromTable != whole-doc counts $totalFromCount")
  }
}
