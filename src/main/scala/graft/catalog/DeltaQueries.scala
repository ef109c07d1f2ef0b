package graft.catalog

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.{sources => flt}

import graft.core.{QueryDef, Tables}
import graft.sources.DeltaLog

/** Delta Lake table-format coverage, oracle-gated: every query builds a
  * real `_delta_log` table from the testdata parquet via [[DeltaLog]]
  * (the public delta.io PROTOCOL.md implemented Spark-first — the
  * lakehouse companion to the Iceberg rows in SURVEY §2.1), reads it
  * back through log replay, and the DuckDB oracle recomputes the same
  * answer relationally from the raw tables. */
object DeltaQueries {
  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables(s, d, n)
  private def dec2(c: Column): Column = c.cast(DecimalType(12, 2))
  private def decSum(c: Column): Column =
    sum(c).cast(org.apache.spark.sql.types.DoubleType)

  private def li(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem").select(
      col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
      dec2(col("l_quantity")).as("l_quantity"))

  private def tbl(prefix: String): String =
    graft.core.Scratch.dir(prefix) + "/tbl"

  private def netAgg(d: DataFrame): DataFrame =
    d.agg(count(lit(1)).cast("long").as("n"),
      decSum(col("l_quantity")).as("sum_qty"),
      min("l_orderkey").as("min_ok"), max("l_orderkey").as("max_ok"))

  val deltaSnapshot: QueryDef = QueryDef.sqlBacked(
    "q_delta_snapshot",
    """SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  min(l_orderkey) AS min_ok, max(l_orderkey) AS max_ok
      |FROM lineitem
      |WHERE l_orderkey % 3 <> 2 AND NOT (l_orderkey % 5 = 0 AND l_returnflag = 'R')
      |""".stripMargin,
    doc = "Delta-protocol snapshot read (delta.io PROTOCOL.md implemented from scratch, " +
      "no delta jars — the lakehouse companion to the Iceberg source): two append " +
      "commits, then a copy-on-write DELETE whose removes reconcile away the touched " +
      "files and rewrite their survivors; log replay yields the net file set. The " +
      "oracle recomputes the surviving rows relationally.") { (s, d) =>
    val data = li(s, d)
    val dir = tbl("graft_delta_snap")
    DeltaLog.commitAppend(s, dir, data.filter(col("l_orderkey") % 3 === 0),
      timestampMs = 1000L)
    DeltaLog.commitAppend(s, dir, data.filter(col("l_orderkey") % 3 === 1),
      timestampMs = 2000L)
    DeltaLog.deleteWhere(s, dir,
      col("l_orderkey") % 5 === 0 && col("l_returnflag") === "R",
      timestampMs = 3000L)
    netAgg(DeltaLog.read(s, dir))
  }

  val deltaTimeTravel: QueryDef = QueryDef.sqlBacked(
    "q_delta_time_travel",
    """SELECT
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem WHERE l_orderkey % 2 = 0)
      |    AS n_v0,
      |  (SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) FROM lineitem
      |    WHERE l_orderkey % 2 = 0) AS qty_v0,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem
      |    WHERE l_orderkey % 2 = 0 AND l_orderkey % 7 <> 0) AS n_now,
      |  (SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) FROM lineitem
      |    WHERE l_orderkey % 2 = 0 AND l_orderkey % 7 <> 0) AS qty_now
      |""".stripMargin,
    doc = "Delta TIME TRAVEL by version AND by commit timestamp (PROTOCOL.md commitInfo): " +
      "a delete at v1 rewrites history forward, but version 0 — addressed either way — " +
      "still replays to the pre-delete file set. The oracle computes both epochs " +
      "relationally; equality proves old versions are immutable, not reconstructed.") { (s, d) =>
    val data = li(s, d)
    val dir = tbl("graft_delta_tt")
    DeltaLog.commitAppend(s, dir, data.filter(col("l_orderkey") % 2 === 0),
      timestampMs = 1000L)
    DeltaLog.deleteWhere(s, dir, col("l_orderkey") % 7 === 0, timestampMs = 2000L)
    // version-pinned and timestamp-pinned reads must agree: assert by
    // joining both into the result (a mismatch would break the hash)
    val v0 = DeltaLog.read(s, dir, version = Some(0L))
      .agg(count(lit(1)).cast("long").as("n_v0"),
        decSum(col("l_quantity")).as("qty_v0"))
    val asOf = DeltaLog.readAsOf(s, dir, tsMs = 1500L)
      .agg(count(lit(1)).cast("long").as("n_ts"),
        decSum(col("l_quantity")).as("qty_ts"))
    val now = DeltaLog.read(s, dir)
      .agg(count(lit(1)).cast("long").as("n_now"),
        decSum(col("l_quantity")).as("qty_now"))
    v0.crossJoin(asOf).crossJoin(now)
      .filter(col("n_v0") === col("n_ts") && col("qty_v0") === col("qty_ts"))
      .select("n_v0", "qty_v0", "n_now", "qty_now")
  }

  val deltaIncremental: QueryDef = QueryDef.sqlBacked(
    "q_delta_incremental",
    """SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  min(l_orderkey) AS min_ok, max(l_orderkey) AS max_ok
      |FROM lineitem WHERE l_orderkey % 4 = 1""".stripMargin,
    doc = "Delta incremental append-diff (v0, v2]: reads ONLY the files version 1 added " +
      "with dataChange=true — version 2 is a COMPACTION committed dataChange=false " +
      "(PROTOCOL.md's reason the flag exists), so the rewrite contributes nothing even " +
      "though it touched every live file. The aggregate matching v1's slice exactly " +
      "proves both the window arithmetic and the housekeeping invisibility.") { (s, d) =>
    val data = li(s, d)
    val dir = tbl("graft_delta_inc")
    DeltaLog.commitAppend(s, dir, data.filter(col("l_orderkey") % 4 === 0),
      timestampMs = 1000L)
    DeltaLog.commitAppend(s, dir, data.filter(col("l_orderkey") % 4 === 1),
      timestampMs = 2000L)
    DeltaLog.compact(s, dir, timestampMs = 3000L)
    netAgg(DeltaLog.readIncremental(s, dir, fromVersion = 0L, toVersion = 2L))
  }

  val deltaStatsPruned: QueryDef = QueryDef.sqlBacked(
    "q_delta_stats_pruned",
    """SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  min(l_orderkey) AS min_ok, max(l_orderkey) AS max_ok,
      |  CAST(1 AS BOOLEAN) AS pruned
      |FROM lineitem
      |WHERE l_orderkey < (SELECT max(l_orderkey) // 5 FROM lineitem)""".stripMargin,
    doc = "Delta file skipping from the add actions' per-file stats JSON (numRecords/" +
      "minValues/maxValues/nullCount harvested from the parquet FOOTERS at commit — " +
      "never a second data scan), same conservative-on-missing law as the Iceberg and " +
      "package pruners: a range predicate over a range-clustered layout plans a strict " +
      "subset of files; the `pruned` column is computed from the two plans so a " +
      "regression to scan-everything fails the hash.") { (s, d) =>
    val data = li(s, d).repartitionByRange(8, col("l_orderkey"))
    val dir = tbl("graft_delta_stats")
    DeltaLog.commitAppend(s, dir, data, timestampMs = 1000L)
    val cut = data.agg(max("l_orderkey")).head().getLong(0) / 5
    val filters = Seq(flt.LessThan("l_orderkey", cut): flt.Filter)
    val (_, planned) = DeltaLog.planFiles(s, dir, filters = filters)
    val (_, allFiles) = DeltaLog.planFiles(s, dir)
    val prunedProof = planned.nonEmpty && planned.size < allFiles.size
    netAgg(DeltaLog.read(s, dir, filters = filters)
        .filter(col("l_orderkey") < cut))
      .withColumn("pruned", lit(prunedProof))
  }

  val deltaStream: QueryDef = QueryDef.sqlBacked(
    "q_delta_stream",
    """SELECT 0 AS version, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem WHERE l_orderkey % 3 = 0
      |UNION ALL
      |SELECT 1, CAST(COUNT(*) AS BIGINT),
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
      |FROM lineitem WHERE l_orderkey % 3 = 1
      |UNION ALL
      |SELECT 2, CAST(0 AS BIGINT), CAST(0 AS DOUBLE)
      |UNION ALL
      |SELECT 3, CAST(COUNT(*) AS BIGINT),
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
      |FROM lineitem WHERE l_orderkey % 3 = 2
      |ORDER BY version""".stripMargin,
    doc = "Delta table as a STREAMING SOURCE (streaming/DeltaStreamRunner): one " +
      "micro-batch per commit, resumed mid-stream from the version cursor across a " +
      "simulated restart; the OPTIMIZE version (2) yields EXACTLY zero rows " +
      "(dataChange=false invisibility) and appears in the result as its empty epoch. " +
      "Each epoch is one distributed parquet scan of that version's added files.") {
    (s, d) =>
      import s.implicits._
      val data = li(s, d)
      val dir = tbl("graft_delta_stream")
      DeltaLog.commitAppend(s, dir, data.filter(col("l_orderkey") % 3 === 0),
        timestampMs = 1000L)                                           // v0
      DeltaLog.commitAppend(s, dir, data.filter(col("l_orderkey") % 3 === 1),
        timestampMs = 2000L)                                           // v1
      def epochAgg(df: org.apache.spark.sql.DataFrame) =
        df.agg(count(lit(1)).cast("long"),
          coalesce(decSum(col("l_quantity")), lit(0.0))).head()
      val results = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
      // first run drains what exists, then "the process restarts": new
      // commits land and a second drain resumes from the persisted cursor
      var cursor = -1L
      graft.streaming.DeltaStreamRunner.drain(s, dir, cursor) { (v, df) =>
        val r = epochAgg(df)
        results += ((v, r.getLong(0), r.getDouble(1))); cursor = v; r.getLong(0)
      }
      DeltaLog.compact(s, dir, timestampMs = 3000L, targetFiles = 1)   // v2 OPTIMIZE
      DeltaLog.commitAppend(s, dir, data.filter(col("l_orderkey") % 3 === 2),
        timestampMs = 4000L)                                           // v3
      graft.streaming.DeltaStreamRunner.drain(s, dir, cursor) { (v, df) =>
        val r = epochAgg(df)
        results += ((v, r.getLong(0), r.getDouble(1))); cursor = v; r.getLong(0)
      }
      results.toSeq.toDF("version", "n", "sum_qty")
        .select(col("version").cast("int").as("version"), col("n"), col("sum_qty"))
        .orderBy("version")
  }

  val deltaColumnMapping: QueryDef = QueryDef.sqlBacked(
    "q_delta_column_mapping",
    """SELECT l_returnflag AS flag,
      |  CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  CAST(1 AS BOOLEAN) AS metadata_only
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    doc = "Delta COLUMN MAPPING (reader v2, mode 'name'): the table's parquet files " +
      "carry stable physical names (col-<id>), so renaming l_returnflag to 'flag' is " +
      "ONE metaData commit touching zero data files; the read translates physical to " +
      "logical and groups by the NEW name. The metadata_only flag gates that no file " +
      "changed across the rename.") { (s, d) =>
    val data = li(s, d)
    val dir = tbl("graft_delta_cm")
    DeltaLog.commitAppend(s, dir, data, timestampMs = 1000L, columnMapping = true)
    val before = DeltaLog.snapshot(s, dir).files.map(_.path).toSet
    DeltaLog.renameColumn(s, dir, "l_returnflag", "flag", timestampMs = 2000L)
    val after = DeltaLog.snapshot(s, dir).files.map(_.path).toSet
    DeltaLog.read(s, dir)
      .groupBy("flag")
      .agg(count(lit(1)).cast("long").as("n"), decSum(col("l_quantity")).as("sum_qty"))
      .withColumn("metadata_only", lit(before == after))
      .orderBy("flag")
  }

  val deltaDv: QueryDef = QueryDef.sqlBacked(
    "q_delta_dv",
    """SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  min(l_orderkey) AS min_ok, max(l_orderkey) AS max_ok,
      |  CAST(1 AS BOOLEAN) AS merge_on_read
      |FROM lineitem
      |WHERE NOT (l_orderkey % 7 = 2) AND NOT (l_orderkey % 7 = 5 AND l_returnflag = 'A')
      |""".stripMargin,
    doc = "Delta DELETION VECTORS (reader v3 feature, PROTOCOL.md): two merge-on-read " +
      "DELETEs record row indexes in roaring bitmap files instead of rewriting data — " +
      "the second SUPERSEDES the first (old ∪ new per file); the read anti-joins the " +
      "broadcast (file,row_index) set against parquet row-index metadata. The " +
      "merge_on_read flag gates that NO physical data file changed across both " +
      "deletes, so a regression to copy-on-write fails the hash.") { (s, d) =>
    val data = li(s, d)
    val dir = tbl("graft_delta_dv")
    DeltaLog.commitAppend(s, dir, data.repartition(6, col("l_orderkey")),
      timestampMs = 1000L)
    val before = DeltaLog.snapshot(s, dir).files.map(_.path).toSet
    DeltaLog.deleteWhereDv(s, dir, col("l_orderkey") % 7 === 2, timestampMs = 2000L)
    DeltaLog.deleteWhereDv(s, dir,
      col("l_orderkey") % 7 === 5 && col("l_returnflag") === "A", timestampMs = 3000L)
    val after = DeltaLog.snapshot(s, dir).files.map(_.path).toSet
    netAgg(DeltaLog.read(s, dir)).withColumn("merge_on_read", lit(before == after))
  }

  val deltaZorder: QueryDef = QueryDef.sqlBacked(
    "q_delta_zorder",
    """SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  CAST(1 AS BOOLEAN) AS pruned_orderkey, CAST(1 AS BOOLEAN) AS pruned_partkey
      |FROM lineitem
      |WHERE l_orderkey < (SELECT max(l_orderkey) // 5 FROM lineitem)""".stripMargin,
    doc = "Delta OPTIMIZE ZORDER BY (operators/ZOrderLayout, shared with Iceberg): the " +
      "table starts hash-scattered (no file prunable on either key), the rewrite " +
      "re-clusters on the Morton curve over (l_orderkey, l_partkey), and the plan " +
      "proof requires range predicates on BOTH columns to skip files — a lexicographic " +
      "sort would only prune its first key. Both pruned flags gate inside the hash.") {
    (s, d) =>
      val data = t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"),
          dec2(col("l_quantity")).as("l_quantity"))
        .repartition(8, col("l_orderkey") * 2654435761L % 1048576)
      val dir = tbl("graft_delta_z")
      DeltaLog.commitAppend(s, dir, data, timestampMs = 1000L)
      DeltaLog.compact(s, dir, timestampMs = 2000L, targetFiles = 8,
        zorderBy = Seq("l_orderkey", "l_partkey"))
      val cuts = data.agg(max("l_orderkey"), max("l_partkey")).head()
      val cutOk = cuts.getLong(0) / 5
      val cutPk = cuts.getLong(1) / 5
      val fOk = Seq(flt.LessThan("l_orderkey", cutOk): flt.Filter)
      val fPk = Seq(flt.LessThan("l_partkey", cutPk): flt.Filter)
      val (_, allFiles) = DeltaLog.planFiles(s, dir)
      val (_, pOk) = DeltaLog.planFiles(s, dir, filters = fOk)
      val (_, pPk) = DeltaLog.planFiles(s, dir, filters = fPk)
      val prunedOk = pOk.nonEmpty && pOk.size < allFiles.size
      val prunedPk = pPk.nonEmpty && pPk.size < allFiles.size
      DeltaLog.read(s, dir, filters = fOk)
        .filter(col("l_orderkey") < cutOk)
        .agg(count(lit(1)).cast("long").as("n"),
          decSum(col("l_quantity")).as("sum_qty"))
        .withColumn("pruned_orderkey", lit(prunedOk))
        .withColumn("pruned_partkey", lit(prunedPk))
  }

  val deltaPartitioned: QueryDef = QueryDef.sqlBacked(
    "q_delta_partitioned",
    """SELECT l_returnflag,
      |  CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  CAST(1 AS BOOLEAN) AS pruned
      |FROM lineitem
      |WHERE l_returnflag IN ('A', 'R')
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    doc = "Delta Hive-partitioned layout: partition values live in the LOG's add actions " +
      "(data files do not carry the column — verified by spec), the reader injects " +
      "them via a broadcast join on _metadata.file_path, and an IN filter prunes at " +
      "the partition level before any file is opened. Grouping BY the injected column " +
      "proves the injection types and values, not just row counts.") { (s, d) =>
    val data = li(s, d)
    val dir = tbl("graft_delta_part")
    DeltaLog.commitAppend(s, dir, data, timestampMs = 1000L,
      partitionBy = Seq("l_returnflag"))
    val filters = Seq(flt.In("l_returnflag", Array("A", "R")): flt.Filter)
    val (_, planned) = DeltaLog.planFiles(s, dir, filters = filters)
    val (_, allFiles) = DeltaLog.planFiles(s, dir)
    val prunedProof = planned.nonEmpty && planned.size < allFiles.size
    DeltaLog.read(s, dir, filters = filters)
      .filter(col("l_returnflag").isin("A", "R"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).cast("long").as("n"),
        decSum(col("l_quantity")).as("sum_qty"))
      .withColumn("pruned", lit(prunedProof))
      .orderBy("l_returnflag")
  }

  val deltaCheckpoint: QueryDef = QueryDef.sqlBacked(
    "q_delta_checkpoint",
    """SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  min(l_orderkey) AS min_ok, max(l_orderkey) AS max_ok
      |FROM lineitem WHERE l_orderkey % 4 < 3""".stripMargin,
    doc = "Delta parquet CHECKPOINT + vacuumed log tail: three commits, a checkpoint at " +
      "v2, then every pre-checkpoint JSON commit is DELETED before the read — replay " +
      "must reconstruct the table from the checkpoint file alone (plus nothing: the " +
      "tail is empty), proving snapshot state round-trips through the one-parquet-file " +
      "compaction the protocol's O(tail) replay rule depends on.") { (s, d) =>
    val data = li(s, d)
    val dir = tbl("graft_delta_cp")
    (0 to 2).foreach(i =>
      DeltaLog.commitAppend(s, dir, data.filter(col("l_orderkey") % 4 === i),
        timestampMs = 1000L + i))
    DeltaLog.checkpoint(s, dir)
    (0L to 2L).foreach { v =>
      java.nio.file.Files.delete(
        java.nio.file.Paths.get(dir, "_delta_log", f"$v%020d.json"))
    }
    netAgg(DeltaLog.read(s, dir))
  }

  val all: Seq[QueryDef] = Seq(
    deltaSnapshot, deltaTimeTravel, deltaIncremental,
    deltaStatsPruned, deltaPartitioned, deltaZorder, deltaDv,
    deltaColumnMapping, deltaStream, deltaCheckpoint)
}
