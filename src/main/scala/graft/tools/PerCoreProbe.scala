package graft.tools

import org.apache.spark.sql.functions._

/** Diagnostic: decompose the per-core validation wall stage by stage
  * (scan → same-width noop → rank-only → rank+verdict → full
  * annotate → accepted filter) over the exact single-split vectorized
  * parquet shape the bench per-core cell measures. Not part of the
  * driver contract — a local lever-finding tool for the
  * validate/noop ratio.
  */
object PerCoreProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.Sessions.local("32", "32")
    spark.conf.set("spark.sql.files.maxPartitionBytes", (4L << 30).toString)
    spark.conf.set("spark.sql.files.minPartitionNum", "1")

    val sinkDir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/dev/shm"), "graft_probe").toString
    val li1 = graft.core.Tables(spark, sfDir, "lineitem")
    (1 to 8).map(_ => li1).reduce(_ unionAll _)
      .coalesce(1).write.parquet(s"$sinkDir/li")
    val li = spark.read.parquet(s"$sinkDir/li")
    require(li.rdd.getNumPartitions == 1, li.rdd.getNumPartitions.toString)

    val program = graft.contract.ValidationProgram.compile(
      graft.catalog.CoreQueries.lineitemPolicy)
    val rankCol = program.ruleCols
      .map { case (r, c) =>
        val failRank =
          if (program.policy.fatalRules.contains(r.id)) graft.contract.Verdict.Fatal.rank
          else graft.contract.Verdict.Violation.rank
        when(coalesce(c, lit(false)), lit(graft.contract.Verdict.Pass.rank))
          .otherwise(lit(failRank))
      }
      .reduce((a, b) => greatest(a, b))

    // variant: rank from two boolean ORs (any-fatal-fail, any-fail)
    // instead of greatest-of-whens — fewer int ops per row
    val fails = program.ruleCols.map { case (r, c) =>
      (program.policy.fatalRules.contains(r.id), !coalesce(c, lit(false)))
    }
    val anyFatal = fails.collect { case (true, f) => f }
      .reduceOption(_ || _).getOrElse(lit(false))
    val anyFail = fails.map(_._2).reduce(_ || _)
    val rankOr =
      when(anyFatal, lit(graft.contract.Verdict.Fatal.rank))
        .when(anyFail, lit(graft.contract.Verdict.Violation.rank))
        .otherwise(lit(graft.contract.Verdict.Pass.rank))
    // the SAME name tables annotate indexes into (distinct arrays for
    // _v/_d: an identical expression twice would be collapsed by
    // codegen subexpression elimination and under-measure the variant)
    val verdictNames = typedLit(
      graft.contract.ValidationProgram.verdictNamesByRank)
    val dispositionNames = typedLit(
      graft.contract.ValidationProgram.dispositionNamesByRank)
    def annotateOr(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("_r", rankOr)
      .withColumn("_v", element_at(verdictNames, col("_r") + 1))
      .withColumn("_d", element_at(dispositionNames, col("_r") + 1))
      .drop("_r")

    val passes: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "scan" -> (() => li),
      "noop2" -> (() => li.withColumn("_v", lit("pass")).withColumn("_d", lit("accept"))),
      "rank_only" -> (() => li.withColumn("_r", rankCol)),
      "rank_or_only" -> (() => li.withColumn("_r", rankOr)),
      "rank_as_2cols" -> (() => li.withColumn("_r", rankCol)
        .withColumn("_r2", col("_r") + 1)),
      "annotate" -> (() => program.annotate(li)),
      "annotate_or" -> (() => annotateOr(li)),
      // direct constant-string branches off the materialized rank
      // (the pre-r8 shape) — isolates element_at vs when-chain cost
      "annotate_when" -> (() => li.withColumn("_r", rankCol)
        .withColumn("_v",
          when(col("_r") === 0, lit("pass"))
            .when(col("_r") === 1, lit("warning"))
            .when(col("_r") === 2, lit("violation"))
            .when(col("_r") === 3, lit("critical"))
            .otherwise(lit("fatal")))
        .withColumn("_d",
          when(col("_r") === 0, lit("accept"))
            .when(col("_r") === 1, lit("accept"))
            .when(col("_r") === 2, lit("quarantine"))
            .when(col("_r") === 3, lit("reject_batch"))
            .otherwise(lit("reject_run")))
        .drop("_r")),
      "accepted" -> (() => program.accepted(li)))

    passes.foreach { case (_, p) => p().write.format("noop").mode("overwrite").save() }
    val walls = (1 to 6).map { _ =>
      passes.map { case (name, p) =>
        val t0 = System.nanoTime()
        p().write.format("noop").mode("overwrite").save()
        name -> (System.nanoTime() - t0) / 1e9
      }
    }
    passes.map(_._1).foreach { name =>
      val w = walls.map(_.toMap.apply(name)).min
      println(f"[probe] $name%-14s ${w}%.3f s")
    }

    // KERNEL cells (the reference's validation-cell shape: vector
    // kernels over in-memory 64k-row batches, one core, gated bytes):
    // rank evaluated per row, reduced to one long so nothing is pruned
    // and no row is re-materialized at a sink.
    spark.conf.set("spark.sql.inMemoryColumnarStorage.compression", "false")
    spark.conf.set("spark.sql.inMemoryColumnarStorage.batchSize", "65536")
    val cached = li.persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    cached.count()
    def ruleRank(i: Int) = {
      val (r, c) = program.ruleCols(i)
      val failRank =
        if (program.policy.fatalRules.contains(r.id)) graft.contract.Verdict.Fatal.rank
        else graft.contract.Verdict.Violation.rank
      when(coalesce(c, lit(false)), lit(graft.contract.Verdict.Pass.rank))
        .otherwise(lit(failRank))
    }
    val kernels: Seq[(String, () => Long)] = Seq(
      "k_scan_parquet" -> (() => li.select(sum(col("l_quantity"))).head().getDouble(0).toLong),
      "k_rank_parquet" -> (() => li.select(sum(rankCol)).head().getLong(0)),
      "k_scan_cache" -> (() => cached.select(sum(col("l_quantity"))).head().getDouble(0).toLong),
      "k_rank_cache" -> (() => cached.select(sum(rankCol)).head().getLong(0))) ++
      program.ruleCols.indices.map { i =>
        s"k_rule_${program.ruleCols(i)._1.id}" ->
          (() => cached.select(sum(ruleRank(i))).head().getLong(0))
      } ++ Seq(
      "k_5cols_cache" -> (() => cached.select(sum(
        col("l_orderkey") + col("l_quantity") +
          length(col("l_returnflag")) + length(col("l_linestatus")) +
          unix_timestamp(col("l_shipdate")))).head().getDouble(0).toLong))
    kernels.foreach { case (_, k) => k() }
    val kwalls = (1 to 6).map { _ =>
      kernels.map { case (name, k) =>
        val t0 = System.nanoTime(); k()
        name -> (System.nanoTime() - t0) / 1e9
      }
    }
    kernels.map(_._1).foreach { name =>
      val w = kwalls.map(_.toMap.apply(name)).min
      println(f"[probe] $name%-14s ${w}%.3f s")
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(sinkDir))
    spark.stop()
  }
}
