package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Exact k-th-smallest (order statistic) per group WITHOUT sorting the
  * group — the scale-true replacement for
  * `row_number() OVER (PARTITION BY g ORDER BY v)` rank selection,
  * which sorts every row of every group in one task per group (three
  * groups at 100 TB = three tasks sorting 33 TB each).
  *
  * The value of the k-th element under ANY tie-break is determined by
  * value-level counts alone: it is the smallest v with count(≤v) ≥ k.
  * So selection needs no total order, only value counts:
  *
  *  1. one aggregate for group sizes (k = rank target per group);
  *  2. one deterministic hash-sample pass (≈`sampleTarget` rows per
  *     group, rate adapted per group — never a driver collect of data);
  *  3. bracket [a, b] around the target rank from sample quantiles,
  *     then ONE counting pass per group:
  *     count(v < a), count(≤ a), count(≤ b);
  *     if the sample nailed the value (count(<a) < k ≤ count(≤a)) the
  *     answer is a, extraction skipped — the common case for discrete
  *     or repeated values;
  *  4. otherwise rank only the rows INSIDE the bracket (w.h.p. a few
  *     percent of the group; widened to the whole group only when the
  *     bracket is provably wrong, never silently).
  *
  * Every pass is a full-parallel aggregate — no single-task sort at
  * any group size. Deterministic end-to-end (hash sample, exact
  * counts), so results are partition-count invariant and
  * oracle-checkable against the window formulation.
  */
object DistributedSelect {

  /** Per-group LOWER MEDIAN (k = (n+1) div 2) of `valueCol`.
    * Returns one row per group: (groupCols..., out). */
  def lowerMedianByGroup(df: DataFrame, groupCols: Seq[String],
      valueCol: String, out: String = "median",
      sampleTarget: Int = 4096): DataFrame =
    kthByGroup(df, groupCols, valueCol, expr("(cast(__n as bigint) + 1) div 2"),
      out, sampleTarget)

  /** Per-group k-th smallest of `valueCol`, where `kExpr` may reference
    * `__n` (the group size) — e.g. `(__n + 1) div 2` for the lower
    * median, `ceil(__n * 0.99)` for P99. */
  def kthByGroup(df: DataFrame, groupCols: Seq[String], valueCol: String,
      kExpr: org.apache.spark.sql.Column, out: String,
      sampleTarget: Int = 4096): DataFrame = {
    val g = groupCols.map(col)
    val v = col(valueCol)
    val base = df.select(g :+ v.as("__v"): _*).filter(col("__v").isNotNull).persist()

    // pass 1: group sizes → rank targets
    val sizes = base.groupBy(g: _*)
      .agg(count(lit(1)).as("__n"))
      .withColumn("__k", kExpr)

    // pass 2: deterministic hash sample, rate adapted per group so each
    // group lands ≈ sampleTarget rows regardless of size
    val withRate = base.join(sizes, groupCols)
      .withColumn("__f", greatest(lit(1L), (col("__n") / sampleTarget).cast("long")))
    val sample = withRate.filter(
      pmod(xxhash64((col("__v") +: g): _*), col("__f")) === 0)

    // bracket per group from the sample's rank neighborhood around k:
    // rank fraction k/n mapped into the sample, ± a safety margin
    val sw = Window.partitionBy(g: _*).orderBy(col("__v"))
    val sampled = sample
      .withColumn("__sr", row_number().over(sw))
      .withColumn("__sn", count(lit(1)).over(Window.partitionBy(g: _*)))
    val target = (col("__k").cast("double") / col("__n")) * col("__sn")
    val margin = greatest(lit(64.0), col("__sn") / 32)
    val lowRank = greatest(lit(1L), floor(target - margin).cast("long"))
    val highRank = least(col("__sn"), ceil(target + margin).cast("long"))
    val brackets = sampled
      .withColumn("__isLow", col("__sr") === lowRank)
      .withColumn("__isHigh", col("__sr") === highRank)
      .filter(col("__isLow") || col("__isHigh"))
      .groupBy(g: _*)
      .agg(min(when(col("__isLow"), col("__v"))).as("__a"),
        max(when(col("__isHigh"), col("__v"))).as("__b"))

    // pass 3: exact counts at the bracket endpoints. LEFT join: a group
    // whose sample came up empty (possible only under adversarial hash
    // alignment) gets null endpoints → the widened fallback below
    val counted = base.join(brackets, groupCols, "left")
      .groupBy(g: _*)
      .agg(
        sum(when(col("__v") < col("__a"), 1L).otherwise(0L)).as("__nlt_a"),
        sum(when(col("__v") <= col("__a"), 1L).otherwise(0L)).as("__nle_a"),
        sum(when(col("__v") <= col("__b"), 1L).otherwise(0L)).as("__nle_b"),
        min("__v").as("__min"), max("__v").as("__max"),
        first("__a").as("__a"), first("__b").as("__b"))
      .join(sizes, groupCols)

    // direct hits: the k-th value IS an endpoint (ties make this common)
    val hitA = col("__nlt_a") < col("__k") && col("__k") <= col("__nle_a")
    val bracketOk = col("__nle_a") < col("__k") && col("__k") <= col("__nle_b")
    val resolved = counted.withColumn("__hit",
        when(hitA, col("__a")).otherwise(lit(null)))
      // effective bracket: verified (a, b]; provably-wrong samples widen
      // to the whole group — loud in the plan, never silently wrong
      .withColumn("__lo", when(bracketOk, col("__a")).otherwise(lit(null)))
      .withColumn("__hi", when(bracketOk, col("__b")).otherwise(col("__max")))
      .withColumn("__base", when(bracketOk, col("__nle_a")).otherwise(lit(0L)))
      .persist()

    val hits = resolved.filter(col("__hit").isNotNull)
      .select(g :+ col("__hit").as(out): _*)

    // pass 4: rank only inside the verified bracket (v in (lo, hi])
    val misses = resolved.filter(col("__hit").isNull)
      .select(g ++ Seq(col("__lo"), col("__hi"), col("__base"), col("__k")): _*)
    val inBracket = base.join(misses, groupCols)
      .filter((col("__lo").isNull || col("__v") > col("__lo")) &&
        col("__v") <= col("__hi"))
    val bw = Window.partitionBy(g: _*).orderBy(col("__v"))
    val extracted = inBracket
      .withColumn("__r", row_number().over(bw) + col("__base"))
      // row_number is an arbitrary tie order, but every tie shares __v,
      // so ANY row landing on rank k carries the k-th value
      .filter(col("__r") === col("__k"))
      .select(g :+ col("__v").as(out): _*)

    hits.unionByName(extracted)
  }

  /** Several exact quantiles per group in ONE shared pass set (sizes,
    * sample, brackets, endpoint counts are all computed once for every
    * quantile; only the tiny in-bracket extracts are per-quantile).
    * `qs` maps output column name → quantile fraction; semantics are
    * percentile_disc: the smallest v with count(≤v) ≥ ⌈q·n⌉.
    * Returns one row per group: (groupCols..., q1, q2, ...). */
  def quantilesByGroup(df: DataFrame, groupCols: Seq[String], valueCol: String,
      qs: Seq[(String, Double)], sampleTarget: Int = 4096): DataFrame = {
    require(qs.nonEmpty && qs.forall { case (_, q) => q > 0 && q <= 1 })
    val g = groupCols.map(col)
    val base = df.select(g :+ col(valueCol).as("__v"): _*)
      .filter(col("__v").isNotNull).persist()

    val sizes0 = base.groupBy(g: _*).agg(count(lit(1)).as("__n"))
    val sizes = qs.zipWithIndex.foldLeft(sizes0) { case (acc, ((_, q), i)) =>
      acc.withColumn(s"__k$i",
        greatest(lit(1L), ceil(col("__n") * q).cast("long")))
    }

    val withRate = base.join(sizes, groupCols)
      .withColumn("__f", greatest(lit(1L), (col("__n") / sampleTarget).cast("long")))
    val sample = withRate.filter(
      pmod(xxhash64((col("__v") +: g): _*), col("__f")) === 0)

    val sw = Window.partitionBy(g: _*).orderBy(col("__v"))
    val sampled0 = sample
      .withColumn("__sr", row_number().over(sw))
      .withColumn("__sn", count(lit(1)).over(Window.partitionBy(g: _*)))
    val margin = greatest(lit(64.0), col("__sn") / 32)
    val sampled = qs.zipWithIndex.foldLeft(sampled0) { case (acc, (_, i)) =>
      val target = (col(s"__k$i").cast("double") / col("__n")) * col("__sn")
      acc
        .withColumn(s"__isLow$i",
          col("__sr") === greatest(lit(1L), floor(target - margin).cast("long")))
        .withColumn(s"__isHigh$i",
          col("__sr") === least(col("__sn"), ceil(target + margin).cast("long")))
    }
    val anyMark = qs.indices.map(i => col(s"__isLow$i") || col(s"__isHigh$i")).reduce(_ || _)
    val bracketAggs = qs.indices.flatMap(i => Seq(
      min(when(col(s"__isLow$i"), col("__v"))).as(s"__a$i"),
      max(when(col(s"__isHigh$i"), col("__v"))).as(s"__b$i")))
    val brackets = sampled.filter(anyMark)
      .groupBy(g: _*)
      .agg(bracketAggs.head, bracketAggs.tail: _*)

    val counted = base.join(brackets, groupCols, "left")
      .groupBy(g: _*)
      .agg(
        min("__v").as("__min"),
        (Seq(max("__v").as("__max")) ++ qs.indices.flatMap(i => Seq(
          sum(when(col("__v") < col(s"__a$i"), 1L).otherwise(0L)).as(s"__nlt_a$i"),
          sum(when(col("__v") <= col(s"__a$i"), 1L).otherwise(0L)).as(s"__nle_a$i"),
          sum(when(col("__v") <= col(s"__b$i"), 1L).otherwise(0L)).as(s"__nle_b$i"),
          first(s"__a$i").as(s"__a$i"), first(s"__b$i").as(s"__b$i")))): _*)
      .join(sizes, groupCols)
      .persist()

    // per-quantile: endpoint hit, or rank inside the verified bracket
    val perQ = qs.zipWithIndex.map { case ((out, _), i) =>
      val k = col(s"__k$i")
      val hitA = col(s"__nlt_a$i") < k && k <= col(s"__nle_a$i")
      val bracketOk = col(s"__nle_a$i") < k && k <= col(s"__nle_b$i")
      val resolved = counted
        .withColumn("__hit", when(hitA, col(s"__a$i")).otherwise(lit(null)))
        .withColumn("__lo", when(bracketOk, col(s"__a$i")).otherwise(lit(null)))
        .withColumn("__hi", when(bracketOk, col(s"__b$i")).otherwise(col("__max")))
        .withColumn("__base", when(bracketOk, col(s"__nle_a$i")).otherwise(lit(0L)))
      val hits = resolved.filter(col("__hit").isNotNull)
        .select(g :+ col("__hit").as(out): _*)
      val misses = resolved.filter(col("__hit").isNull)
        .select(g ++ Seq(col("__lo"), col("__hi"), col("__base"), k.as("__k")): _*)
      val inBracket = base.join(misses, groupCols)
        .filter((col("__lo").isNull || col("__v") > col("__lo")) &&
          col("__v") <= col("__hi"))
      val bw = Window.partitionBy(g: _*).orderBy(col("__v"))
      val extracted = inBracket
        .withColumn("__r", row_number().over(bw) + col("__base"))
        .filter(col("__r") === col("__k"))
        .select(g :+ col("__v").as(out): _*)
      hits.unionByName(extracted)
    }
    perQ.reduce((a, b) => a.join(b, groupCols))
  }
}
