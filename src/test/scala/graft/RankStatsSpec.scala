package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.operators.{EditDistanceJoin, RunningTotals}

/** Laws for the rank-statistics machinery: RunningTotals must equal
  * the windowed formulation on any data and any partitioning, and the
  * symmetric-delete edit-distance join must equal the brute-force
  * cross join. */
class RankStatsSpec extends SparkSpec {
  import spark.implicits._

  test("RunningTotals.perGroup == SUM/ROW_NUMBER OVER, partition-count invariant") {
    val rnd = new scala.util.Random(42)
    val rows = (1 to 2000).map { i =>
      (s"g${rnd.nextInt(5)}", rnd.nextInt(200).toLong, i.toLong)
    }
    for (parts <- Seq(1, 3, 13)) {
      val df = rows.toDF("g", "v", "id").repartition(parts)
      val got = RunningTotals.perGroup(df, Seq("g"), Seq(col("v"), col("id")), "v")
        .select("g", "id", "run_sum", "run_rn")
      val w = Window.partitionBy("g").orderBy(col("v"), col("id"))
      val want = rows.toDF("g", "v", "id")
        .withColumn("run_sum", sum(col("v")).over(w))
        .withColumn("run_rn", row_number().over(w).cast("long"))
        .select("g", "id", "run_sum", "run_rn")
      assert(got.except(want).isEmpty && want.except(got).isEmpty,
        s"parts=$parts mismatch")
    }
  }

  test("RunningTotals at high group cardinality (groups >> partitions, interior + spanning)") {
    val rnd = new scala.util.Random(99)
    // 500 groups over 7 partitions: most groups are interior to one
    // partition (offset 0), some span edges — the O(partitions)
    // boundary-collect must stamp both kinds correctly
    val rows = (1 to 5000).map { i =>
      (s"g${"%03d".format(rnd.nextInt(500))}", rnd.nextInt(50).toLong, i.toLong)
    }
    val df = rows.toDF("g", "v", "id").repartition(7)
    val got = RunningTotals.perGroup(df, Seq("g"), Seq(col("v"), col("id")), "v",
      numPartitions = 7)
      .select("g", "id", "run_sum", "run_rn")
    val w = Window.partitionBy("g").orderBy(col("v"), col("id"))
    val want = rows.toDF("g", "v", "id")
      .withColumn("run_sum", sum(col("v")).over(w))
      .withColumn("run_rn", row_number().over(w).cast("long"))
      .select("g", "id", "run_sum", "run_rn")
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("RunningTotals with no group columns is a global prefix sum") {
    val df = (1 to 500).map(i => (i.toLong, (i % 17).toLong)).toDF("id", "v")
      .repartition(7)
    val got = RunningTotals.perGroup(df, Seq.empty, Seq(col("id")), "v")
    val w = Window.orderBy("id")
    val want = (1 to 500).map(i => (i.toLong, (i % 17).toLong)).toDF("id", "v")
      .withColumn("run_sum", sum(col("v")).over(w))
      .withColumn("run_rn", row_number().over(w).cast("long"))
    assert(got.select("id", "run_sum", "run_rn")
      .except(want.select("id", "run_sum", "run_rn")).isEmpty)
    assert(got.count() == 500L)
  }

  test("RunningTotals.perGroupMulti stamps N prefix sums == N windows, with nulls") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 3000).map { i =>
      (s"g${rnd.nextInt(4)}",
        rnd.nextInt(100).toLong,
        if (rnd.nextInt(10) == 0) null else java.lang.Long.valueOf(rnd.nextInt(9)),
        i.toLong)
    }
    for (parts <- Seq(1, 5, 11)) {
      val df = rows.toDF("g", "a", "b", "id").repartition(parts)
      val got = RunningTotals.perGroupMulti(
        df, Seq("g"), Seq(col("a"), col("id")), Seq("a", "b"), Seq("ca", "cb"))
        .select("g", "id", "ca", "cb", "run_rn")
      val w = Window.partitionBy("g").orderBy(col("a"), col("id"))
      val want = rows.toDF("g", "a", "b", "id")
        .withColumn("ca", sum(col("a")).over(w))
        // null values contribute 0 but still advance the row counter
        .withColumn("cb", coalesce(sum(col("b")).over(w), lit(0L)))
        .withColumn("run_rn", row_number().over(w).cast("long"))
        .select("g", "id", "ca", "cb", "run_rn")
      assert(got.except(want).isEmpty && want.except(got).isEmpty,
        s"parts=$parts mismatch")
    }
  }

  test("EditDistanceJoin == brute force on random mutated strings, k=1 and k=2") {
    val rnd = new scala.util.Random(7)
    val alphabet = "abcdef"
    def mutate(s: String): String = {
      val i = rnd.nextInt(s.length)
      rnd.nextInt(3) match {
        case 0 => s.substring(0, i) + alphabet(rnd.nextInt(6)) + s.substring(i + 1)
        case 1 => s.substring(0, i) + s.substring(i + 1) // delete
        case _ => s.substring(0, i) + alphabet(rnd.nextInt(6)) + s.substring(i)
      }
    }
    val seeds = (1 to 40).map(_ => (1 to 10).map(_ => alphabet(rnd.nextInt(6))).mkString)
    val strs = seeds.flatMap(s => Seq(s, mutate(s), mutate(mutate(s))))
      .distinct.zipWithIndex.map { case (s, i) => (i.toLong, s) }
    val df = strs.toDF("id", "s").repartition(5)
    for (k <- Seq(1, 2)) {
      val got = EditDistanceJoin.pairs(df, "id", "s", k)
        .select("id1", "id2", "dist").as[(Long, Long, Long)].collect().toSet
      val want = (for {
        (i1, s1) <- strs; (i2, s2) <- strs if i1 < i2
        d = levenshteinRef(s1, s2) if d <= k
      } yield (i1, i2, d.toLong)).toSet
      assert(got == want, s"k=$k: missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    }
  }

  private def levenshteinRef(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("SetSimJoin prefix filter == brute-force Jaccard pairs on random token sets") {
    val rnd = new scala.util.Random(11)
    val vocab = (1 to 60).map(i => s"w$i")
    val base = (1 to 50).map { i =>
      (i.toLong, rnd.shuffle(vocab).take(8 + rnd.nextInt(8)))
    }
    // inject guaranteed near-dups: copies with small perturbations
    val docs = base ++ base.filter(_._1 % 5 == 0).map { case (id, ts) =>
      (id + 1000L, ts.drop(1) :+ "wX")
    }
    val df = docs.toDF("id", "toks").repartition(5)
    for (t <- Seq(0.4, 0.6, 0.8)) {
      val got = graft.operators.SetSimJoin.jaccardPairs(df, "id", "toks", t)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      val want = (for {
        (i1, t1) <- docs; (i2, t2) <- docs if i1 < i2
        inter = t1.toSet.intersect(t2.toSet).size
        jac = inter.toDouble / (t1.toSet.size + t2.toSet.size - inter)
        if jac >= t
      } yield (i1, i2)).toSet
      assert(got == want,
        s"t=$t missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    }
  }

  test("SetSimJoin.containmentPairs == brute-force directed containment, incl. subset docs") {
    val rnd = new scala.util.Random(17)
    val vocab = (1 to 60).map(i => s"w$i")
    val base = (1 to 40).map { i =>
      (i.toLong, rnd.shuffle(vocab).take(10 + rnd.nextInt(10)))
    }
    // strict SUBSET docs: high containment A→B with low Jaccard when |B|≫|A|
    val docs = base ++ base.filter(_._1 % 4 == 0).map { case (id, ts) =>
      (id + 1000L, ts.take(4))
    }
    val df = docs.toDF("id", "toks").repartition(5)
    for (t <- Seq(0.6, 0.8, 1.0)) {
      val got = graft.operators.SetSimJoin.containmentPairs(df, "id", "toks", t)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      val want = (for {
        (i1, t1) <- docs; (i2, t2) <- docs if i1 != i2
        c = t1.toSet.intersect(t2.toSet).size.toDouble / t1.toSet.size
        if c >= t
      } yield (i1, i2)).toSet
      assert(got == want,
        s"t=$t missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    }
  }

  test("Skyline == brute-force dominance filter, partition-count invariant, ties survive") {
    val rnd = new scala.util.Random(3)
    val pts = (1 to 400).map(i =>
      (i.toLong, rnd.nextInt(30).toLong, rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
    // duplicate a likely-frontier point exactly: both copies must survive
    val dup = pts :+ (9001L, 29L, 29L, 29L) :+ (9002L, 29L, 29L, 29L)
    def dominates(a: (Long, Long, Long), b: (Long, Long, Long)) =
      a._1 >= b._1 && a._2 >= b._2 && a._3 >= b._3 &&
        (a._1 > b._1 || a._2 > b._2 || a._3 > b._3)
    val want = dup.filterNot { p =>
      dup.exists(q => dominates((q._2, q._3, q._4), (p._2, p._3, p._4)))
    }.map(_._1).toSet
    for (parts <- Seq(1, 4, 11)) {
      val df = dup.toDF("id", "a", "b", "c").repartition(parts)
      val got = graft.operators.Skyline.skyline(df, Seq("a", "b", "c"))
        .select("id").as[Long].collect().toSet
      assert(got == want, s"parts=$parts")
    }
  }

  test("Skyline merge gate: layered anti-chains rescue via the range second pass") {
    // 8 layers × 500 points: layer p holds (i, (500−i)·1000 − p) — an
    // anti-chain WITHIN each layer, and (i, layer 0) dominates (i, layer
    // p>0). With one layer per partition, the first local pass keeps all
    // 4000 rows (> mergeBound); the automatic second pass range-
    // partitions on x, collocating same-x candidates with their layer-0
    // dominators, so the merge sees exactly the 500 true frontier rows.
    val rows = for (p <- 0 until 8; i <- 0 until 500)
      yield (p.toLong, i.toLong, (500L - i) * 1000L - p)
    val df = rows.toDF("p", "x", "y").repartitionByRange(8, col("p"))
    val got = graft.operators.Skyline.skyline(df, Seq("x", "y"), mergeBound = 600L)
      .select("p", "x").as[(Long, Long)].collect().toSet
    assert(got == (0 until 500).map(i => (0L, i.toLong)).toSet)
  }

  test("Skyline merge gate: a true anti-correlated frontier fails typed, not silently") {
    // every point is on the frontier: no partitioning can shrink it, so
    // the single-task merge contract is unsatisfiable at this bound
    val rows = (0 until 5000).map(i => (i.toLong, (5000 - i).toLong))
    val df = rows.toDF("x", "y").repartition(8)
    val e = intercept[graft.core.GraftError.Plan] {
      graft.operators.Skyline.skyline(df, Seq("x", "y"), mergeBound = 100L).count()
    }
    assert(e.getMessage.contains("merge contract"))
  }

  test("TopKByGroup == rank-window formulation, partition-count invariant, tie-exact") {
    val rnd = new scala.util.Random(21)
    // coarse values force ties across the k boundary
    val rows = (1 to 3000).map(i => (s"g${i % 7}", rnd.nextInt(12).toLong, i.toLong))
    for (parts <- Seq(1, 4, 16)) {
      val df = rows.toDF("g", "v", "id").repartition(parts)
      val got = graft.operators.TopKByGroup.topK(df, Seq("g"), "v", "id", 5)
        .select("g", "rank", "id", "v")
      val w = Window.partitionBy("g").orderBy(col("v").desc, col("id"))
      val want = rows.toDF("g", "v", "id")
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 5)
        .select("g", "rank", "id", "v")
      assert(got.except(want).isEmpty && want.except(got).isEmpty, s"parts=$parts")
    }
  }

  test("EditDistanceJoin on very short strings (k >= length, empty variants) stays exact") {
    val strs = Seq("a", "b", "ab", "ba", "abc", "", "c", "ac")
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }
    val df = strs.toDF("id", "s").repartition(3)
    for (k <- Seq(1, 2)) {
      val got = graft.operators.EditDistanceJoin.pairs(df, "id", "s", k)
        .select("id1", "id2", "dist").as[(Long, Long, Long)].collect().toSet
      val want = (for {
        (i1, s1) <- strs; (i2, s2) <- strs if i1 < i2
        d = levenshteinRef(s1, s2) if d <= k
      } yield (i1, i2, d.toLong)).toSet
      assert(got == want, s"k=$k")
    }
  }

  test("deletion variants: counts and the FastSS sharing law on a known pair") {
    val vs = EditDistanceJoin.deletionVariants("abcd", 1).toSet
    assert(vs == Set("abcd", "bcd", "acd", "abd", "abc"))
    // ED("abcd","abed")=1 — they share a 1-deletion variant
    val other = EditDistanceJoin.deletionVariants("abed", 1).toSet
    assert(vs.intersect(other).nonEmpty)
  }
}
