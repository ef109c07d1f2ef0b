package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Substring-level (span) deduplication: find every n-token window
  * whose exact text recurs anywhere in the corpus, keep one canonical
  * occurrence, and mark — or cut — every other occurrence. This is the
  * finer-grained sibling of document dedup (Lee et al., "Deduplicating
  * Training Data Makes Language Models Better", ACL 2022): boilerplate
  * headers, license blocks and quoted passages duplicate at the
  * substring level long before whole documents do.
  *
  * Scale shape (the 100 TB story):
  *  - windowing is a pure map stage (tokenize once, slide, hash);
  *    only (hash 16 B, doc_id, pos) triples ever shuffle — never text.
  *  - the canonical occurrence is the global min (doc_id, pos) per
  *    hash, one aggregate on the hash key; duplicate marking is a
  *    second shuffle join back on the same key (co-partitioned with
  *    the aggregate, so AQE plans it shuffle-free on the probe side).
  *  - span-union coverage is gaps-and-islands per document: one
  *    window pass over each doc's few duplicate spans.
  *  - the cut re-reads each document ONCE and drops covered token
  *    positions with a codegen'd higher-order filter over that doc's
  *    island array (islands per doc ≪ tokens per doc) — no UDF, no
  *    second shuffle of the text.
  *
  * Reference semantics: cdf has document-level dedup only
  * (crates/cdf-core/src/program.rs dedup stages); span-level dedup is
  * part of the LLM-pipeline brief, derived from the public paper.
  */
object SubstringDedup {

  /** (doc_id, pos, h): md5 of each n-token window, 1-based pos —
    * tokenize once, explode positions WITH the token array in scope,
    * so the whole stage is one map pass (no re-join on the text). */
  def windows(docs: DataFrame, n: Int): DataFrame = {
    require(n >= 2)
    docs
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("ts"))
      .filter(size(col("ts")) >= n)
      .select(col("doc_id"), col("ts"),
        explode(sequence(lit(1), size(col("ts")) - (n - 1))).as("pos"))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        md5(concat_ws(" ", slice(col("ts"), col("pos"), lit(n))).cast("binary")).as("h"))
  }

  /** Non-canonical duplicate occurrences: every (doc_id, pos) whose
    * window hash occurs ≥2 times corpus-wide, except the global
    * minimal (doc_id, pos) occurrence — the one copy that survives.
    * Combined key doc_id*1_000_000+pos keeps min() a plain BIGINT
    * aggregate (positions are bounded by document length ≪ 1e6). */
  def duplicateSpans(w: DataFrame): DataFrame = {
    val key = (col("doc_id") * 1000000L + col("pos")).as("ck")
    val canon = w.select(col("h"), key)
      .groupBy("h").agg(count(lit(1)).as("n"), min("ck").as("ck"))
      .filter(col("n") >= 2)
    w.join(canon, "h")
      .filter(col("doc_id") * 1000000L + col("pos") > col("ck"))
      .select("doc_id", "pos", "h")
  }

  /** Per-doc union coverage of duplicate spans [pos, pos+n-1]:
    * gaps-and-islands — flag spans starting past the running max end,
    * running-sum the flags into island ids, then sum island extents.
    * Returns (doc_id, n_dup_spans, dup_token_coverage). */
  def dupCoverage(spans: DataFrame, n: Int): DataFrame = {
    val sp = spans.select(col("doc_id"), col("pos").as("s"),
      (col("pos") + (n - 1)).as("e"))
    val byDoc = Window.partitionBy("doc_id").orderBy("s", "e")
    val prevE = max("e").over(byDoc.rowsBetween(Window.unboundedPreceding, -1))
    val flagged = sp.withColumn("f",
      when(prevE.isNull || col("s") > prevE, 1L).otherwise(0L))
    val grouped = flagged.withColumn("grp",
      sum("f").over(byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    grouped.groupBy("doc_id", "grp")
      .agg(min("s").as("st"), max("e").as("en"), count(lit(1)).as("nsp"))
      .groupBy("doc_id")
      .agg(sum("nsp").as("n_dup_spans"),
        sum(col("en") - col("st") + 1).as("dup_token_coverage"))
  }

  /** Islands per doc as an array column (st, en pairs), for the cut. */
  private def islands(spans: DataFrame, n: Int): DataFrame = {
    val sp = spans.select(col("doc_id"), col("pos").as("s"),
      (col("pos") + (n - 1)).as("e"))
    val byDoc = Window.partitionBy("doc_id").orderBy("s", "e")
    val prevE = max("e").over(byDoc.rowsBetween(Window.unboundedPreceding, -1))
    sp.withColumn("f", when(prevE.isNull || col("s") > prevE, 1L).otherwise(0L))
      .withColumn("grp",
        sum("f").over(byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("doc_id", "grp")
      .agg(min("s").as("st"), max("e").as("en"))
      .groupBy("doc_id")
      .agg(collect_list(struct(col("st"), col("en"))).as("isl"))
  }

  /** Cut every duplicate (non-canonical) span out of the corpus:
    * token positions covered by an island are dropped, the rest are
    * re-joined with single spaces. Documents without duplicate spans
    * pass through byte-identical (modulo the whitespace normalization
    * implied by tokenization). One pass over the text; the per-doc
    * island array rides the row, and the position filter is a
    * codegen'd higher-order function — no UDF. */
  def cut(docs: DataFrame, n: Int): DataFrame = {
    val spans = duplicateSpans(windows(docs, n))
    val isl = islands(spans, n)
    docs.join(isl, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("isl").isNull, trim(regexp_replace(col("text"), "\\s+", " ")))
          .otherwise(
            concat_ws(" ",
              filter(
                zip_with(
                  split(trim(col("text")), "\\s+"),
                  sequence(lit(1), size(split(trim(col("text")), "\\s+"))),
                  (tok, p) => when(
                    exists(col("isl"),
                      i => p >= i.getField("st") && p <= i.getField("en")),
                    lit(null)).otherwise(tok)),
                t => t.isNotNull)))
          .as("text"))
  }
}
