package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Exact edit-distance self-join (all unordered pairs with
  * levenshtein ≤ k) via SYMMETRIC-DELETE candidate generation — the
  * FastSS scheme (Schulz & Mihov's deletion neighborhoods; popularized
  * as SymSpell): if ED(s,t) ≤ k then deleting at most k characters
  * from each yields a common variant, so candidate pairs are exactly
  * the strings sharing a ≤k-deletion variant, then verified with the
  * real Levenshtein.
  *
  * 100 TB shape: the shuffle carries only 64-bit HASHES of deletion
  * variants (a hash collision can only ADD a candidate, never drop a
  * true pair — verification removes it), candidates are generated per
  * shared variant (∝ true near-pairs, never all-pairs), and the
  * verify join is an equi-join on the candidate ids. Against the
  * naive formulation — a cross join with a levenshtein filter, the
  * oracle's formulation — this replaces O(n²) distance evaluations
  * with O(n·C(len,k)) variant hashes.
  *
  * Deterministic: variant sets are deduped, candidates distinct, the
  * verify recomputes the exact distance. Guard: strings shorter than
  * k are fine (deleting past the length just yields shorter variants,
  * including the empty string).
  */
object EditDistanceJoin {

  private[graft] def deletionVariants(s: String, k: Int): Iterator[String] = {
    var cur = Set(s)
    val all = scala.collection.mutable.Set(s)
    var d = 0
    while (d < k) {
      cur = cur.flatMap { v =>
        (0 until v.length).iterator
          .map(i => v.substring(0, i) + v.substring(i + 1)).toSet
      }
      all ++= cur
      d += 1
    }
    all.iterator
  }

  /** Pairs (id1 < id2, dist) with levenshtein(strCol) ≤ k. */
  def pairs(df: DataFrame, idCol: String, strCol: String, k: Int): DataFrame = {
    require(k >= 1, "k must be at least 1 (k=0 is an exact groupBy)")
    val sp = df.sparkSession
    import sp.implicits._
    val base = df.select(col(idCol).cast("long").as("id"), col(strCol).as("s"))
      .filter(col("s").isNotNull)
    // variant hashes: the xxhash64 projection runs BEFORE the exchange,
    // so narrow (id, 8-byte hash) rows are all that shuffles
    val variants = base.as[(Long, String)].flatMap { case (id, s) =>
      deletionVariants(s, k).map(v => (id, v))
    }.toDF("id", "v")
      .select(col("id"), xxhash64(col("v")).as("h"))
    val cands = variants.as("a").join(variants.as("b"), Seq("h"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"))
      .distinct()
    val s1 = base.select(col("id").as("id1"), col("s").as("__s1"))
    val s2 = base.select(col("id").as("id2"), col("s").as("__s2"))
    cands.join(s1, "id1").join(s2, "id2")
      .withColumn("dist", levenshtein(col("__s1"), col("__s2")))
      .filter(col("dist") <= k)
      .select(col("id1"), col("id2"), col("dist").cast("long").as("dist"))
  }
}
