package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL-level corpus curation (the CCNet/Dolma web-crawl shape): a crawl
  * sees the same page under many spellings of its URL, so the FIRST
  * dedup rung is canonicalize-then-group — far cheaper than content
  * hashing (no payload read) and the standard pre-filter before text
  * dedup.
  *
  * Canonicalization rules (each a real-world equivalence, each
  * expressible in portable SQL so the oracle replays them):
  *   1. scheme and host lowercase (RFC 3986: case-insensitive);
  *      path/query case is PRESERVED (case-sensitive by spec);
  *   2. default ports stripped (`:443` for https, `:80` for http);
  *   3. a leading `www.` dropped from the host;
  *   4. the `#fragment` dropped (never sent to the server);
  *   5. tracking parameters dropped (`utm_*`, `gclid`, `fbclid`) with
  *      separator repair (`?&` → `?`, trailing `?`/`&` removed).
  *
  * Scale: canonicalization is a codegen'd per-row Column pipeline (no
  * UDF); the dedup groups on the canonical string — at crawl scale
  * group keys are URLs (~80 B), never page payloads.
  */
object UrlOps {

  /** The canonical form of `url` as a Column expression. */
  def canonicalUrl(url: Column): Column = {
    // prefix = scheme://host[:port] (everything before the 3rd '/'),
    // rest = path?query#fragment (may be empty)
    val prefix = substring_index(url, "/", 3)
    val rest = url.substr(length(prefix) + lit(1), length(url))
    val p1 = lower(prefix)                                  // rule 1
    val p2 = regexp_replace(
      regexp_replace(p1, ":443$", ""), ":80$", "")          // rule 2
    val p3 = regexp_replace(p2, "^(https?://)www\\.", "$1") // rule 3
    val r1 = regexp_replace(rest, "#.*$", "")               // rule 4
    // rule 5, separator-correct in three passes: params after another
    // param drop with their '&'; a tracked FIRST param hands '?' to
    // its successor, or vanishes when alone
    val track = "(utm_[A-Za-z_]*|gclid|fbclid)"
    val r2 = regexp_replace(r1, s"&$track=[^&#]*", "")
    val r3 = regexp_replace(r2, s"\\?$track=[^&#]*&", "?")
    val r4 = regexp_replace(r3, s"\\?$track=[^&#]*$$", "")
    concat(p3, r4)
  }

  /** URL dedup: one row per canonical URL with the kept doc (smallest
    * id — the deterministic keeper rule) and the duplicate count. */
  def urlDedup(df: DataFrame, idCol: String, urlCol: String): DataFrame =
    df.select(col(idCol), canonicalUrl(col(urlCol)).as("canon_url"))
      .groupBy("canon_url")
      .agg(min(col(idCol)).as("keeper"), count(lit(1)).as("n_urls"))
}
