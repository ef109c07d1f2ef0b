package graft

import org.apache.spark.sql.functions._

/** Differential laws for the graph/linkage catalog queries that an
  * oracle hash can't isolate on its own. */
class GraphQueriesSpec extends SparkSpec {

  /** FastSS completeness: the deletion-neighborhood candidate join must
    * find EVERY pair within edit distance 1 that the brute-force
    * cross-join finds — recall loss here would silently shrink the
    * result, and the catalog oracle only proves the one fixture. The
    * probe set mutates real part names with all three edit kinds
    * (substitute / delete / insert) at varied positions. */
  test("fuzzy join candidate generation is complete vs brute-force levenshtein") {
    import spark.implicits._
    val names = spark.read.parquet(s"${sf()}/part.parquet")
      .select("p_name").as[String].distinct().collect().take(60).toSeq
    // deterministic mutations of every kind
    val probes = names.zipWithIndex.flatMap { case (n, i) =>
      val pos = i % math.max(1, n.length - 1)
      Seq(
        n.updated(pos, if (n(pos) == 'x') 'y' else 'x'),       // substitute
        n.substring(0, pos) + n.substring(pos + 1),            // delete
        n.substring(0, pos) + "z" + n.substring(pos))          // insert
    }.distinct
    val nameDf = names.toDF("name")
    val probeDf = probes.toDF("probe")

    def variants(c: String): String =
      s"array_union(array($c), transform(sequence(1, length($c)), " +
        s"i -> concat(substring($c, 1, i - 1), substring($c, i + 1))))"
    val nv = nameDf.select(col("name"), explode(expr(variants("name"))).as("v"))
    val pv = probeDf.select(col("probe"), explode(expr(variants("probe"))).as("v"))
    val fastss = nv.join(pv, "v").select("probe", "name").distinct()
      .filter(levenshtein(col("probe"), col("name")) <= 1)
      .as[(String, String)].collect().toSet

    val brute = probeDf.crossJoin(nameDf)
      .filter(levenshtein(col("probe"), col("name")) <= 1)
      .select("probe", "name").as[(String, String)].collect().toSet

    assert(fastss == brute,
      s"FastSS missed ${(brute -- fastss).take(5)} / extra ${(fastss -- brute).take(5)}")
    assert(brute.nonEmpty, "degenerate fixture: brute force found no pairs")
  }

  /** PageRank conservation bound: with damping d=0.85 in integer
    * micro-units, every node's rank is ≥ the teleport floor and the
    * total mass never exceeds the initial total (floor division only
    * loses mass, never creates it). */
  test("pagerank fixed-point ranks respect the teleport floor and mass bound") {
    val df = graft.catalog.GraphQueries.pagerank.run(spark, sf())
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(1) >= 150000L), "teleport floor violated")
    val total = rows.map(_.getLong(1)).sum
    assert(total <= rows.length.toLong * 1000000L,
      s"mass created from nothing: $total > ${rows.length * 1000000L}")
  }
}
