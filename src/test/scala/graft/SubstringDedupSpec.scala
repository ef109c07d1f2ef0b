package graft

import org.apache.spark.sql.functions._

import graft.llm.SubstringDedup

class SubstringDedupSpec extends SparkSpec {

  private def docsDf = spark.read.parquet(s"${sf("sf0.001")}/documents.parquet")
    .select("doc_id", "text")

  test("token conservation: cut removes exactly the union coverage of duplicate spans") {
    val n = 20
    val docs = docsDf
    val w = SubstringDedup.windows(docs, n)
    val cov = SubstringDedup.dupCoverage(SubstringDedup.duplicateSpans(w), n)
    val totalCoverage = cov.agg(sum("dup_token_coverage")).head.getLong(0)

    // fully-duplicated docs cut to "" — split("") yields [""], so count
    // empty text as zero tokens instead of one
    def tokens(df: org.apache.spark.sql.DataFrame): Long =
      df.select(when(length(trim(col("text"))) === 0, 0L)
          .otherwise(size(split(trim(col("text")), "\\s+")).cast("long")).as("n"))
        .agg(sum("n")).head.getLong(0)

    val before = tokens(docs)
    val after = tokens(SubstringDedup.cut(docs, n))
    assert(totalCoverage > 0, "fixture must contain duplicate spans for the law to bite")
    assert(after === before - totalCoverage)
  }

  test("documents without duplicate spans pass through token-identical") {
    val n = 20
    val docs = docsDf
    val dupDocs = SubstringDedup.duplicateSpans(SubstringDedup.windows(docs, n))
      .select("doc_id").distinct()
    val cutDf = SubstringDedup.cut(docs, n)
    // untouched docs: token sequence identical (cut normalizes whitespace,
    // so compare the token arrays, not raw bytes)
    val mismatched = docs.join(dupDocs, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("orig"))
      .join(cutDf.select(col("doc_id"), split(trim(col("text")), "\\s+").as("cut")), "doc_id")
      .filter(col("orig") =!= col("cut"))
      .count()
    assert(mismatched === 0)
  }

  test("canonical survival: each duplicated window hash still occurs in the cut corpus") {
    // the keep-one-copy rule: cutting must not destroy ALL occurrences of
    // a window — the canonical (min (doc,pos)) occurrence survives intact
    // unless an OVERLAPPING duplicate span clipped it; spans at distinct
    // positions in the fixture's injected tail duplicates are disjoint,
    // so check on a synthetic corpus with one clean cross-doc duplicate
    import spark.implicits._
    val phrase = (1 to 20).map(i => s"tok$i").mkString(" ")
    val corpus = Seq(
      (1L, s"alpha beta $phrase gamma delta"),
      (2L, s"unrelated words here $phrase trailing tail words")
    ).toDF("doc_id", "text")
    val cut = SubstringDedup.cut(corpus, 20).orderBy("doc_id")
      .as[(Long, String)].collect()
    // doc 1 (canonical: smaller (doc,pos)) keeps the phrase; doc 2 loses it
    assert(cut(0)._2.contains(phrase))
    assert(!cut(1)._2.contains(phrase))
    assert(cut(1)._2.startsWith("unrelated words here"))
    assert(cut(1)._2.endsWith("trailing tail words"))
  }
}
