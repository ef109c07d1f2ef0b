package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{sources => flt}

import graft.core.GraftError
import graft.sources.DeltaLog

/** Delta-protocol conformance: log replay, add/remove reconciliation,
  * checkpoint equivalence + vacuumed-tail reads, time travel, stats and
  * partition pruning, incremental append-diff semantics, and the
  * protocol/concurrency refusal gates (delta.io PROTOCOL.md). */
class DeltaLogSpec extends SparkSpec {

  private def nums(lo: Int, hi: Int) = {
    import spark.implicits._
    (lo until hi).map(i => (i.toLong, s"row$i", i % 7)).toDF("id", "tag", "bucket")
  }

  test("append commits replay to a snapshot; version pins time travel") {
    val dir = s"${tmpDir()}/tbl"
    assert(DeltaLog.commitAppend(spark, dir, nums(0, 100), timestampMs = 1000L) == 0L)
    assert(DeltaLog.commitAppend(spark, dir, nums(100, 130), timestampMs = 2000L) == 1L)
    assert(DeltaLog.read(spark, dir).count() == 130)
    assert(DeltaLog.read(spark, dir, version = Some(0L)).count() == 100)
    val snap = DeltaLog.snapshot(spark, dir)
    assert(snap.version == 1L && snap.files.nonEmpty)
    // schema round-trips through the log's schemaString
    assert(DeltaLog.read(spark, dir).schema.fieldNames.toSeq == Seq("id", "tag", "bucket"))
  }

  test("delete is copy-on-write: removes reconcile away, survivors rewritten, null cond keeps rows") {
    val dir = s"${tmpDir()}/tbl"
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b"), (3L, null.asInstanceOf[String]), (4L, "d"))
      .toDF("id", "tag")
    DeltaLog.commitAppend(spark, dir, df, timestampMs = 1000L)
    DeltaLog.deleteWhere(spark, dir, col("tag") === "b", timestampMs = 2000L)
    val after = DeltaLog.read(spark, dir).orderBy("id").collect()
    // id=3's condition is NULL — SQL semantics keep it
    assert(after.map(_.getLong(0)).toSeq == Seq(1L, 3L, 4L))
    // the time-travel read still shows the pre-delete table
    assert(DeltaLog.read(spark, dir, version = Some(0L)).count() == 4)
  }

  test("checkpoint: replay from parquet equals full JSON replay, and survives vacuumed commits") {
    val dir = s"${tmpDir()}/tbl"
    (0 until 6).foreach(i =>
      DeltaLog.commitAppend(spark, dir, nums(i * 10, i * 10 + 10),
        timestampMs = 1000L + i))
    val full = DeltaLog.read(spark, dir).agg(sum("id"), count(lit(1))).head()
    val cpv = DeltaLog.checkpoint(spark, dir)
    assert(cpv == 5L)
    DeltaLog.commitAppend(spark, dir, nums(60, 70), timestampMs = 2000L)
    // vacuum every commit at or before the checkpoint: replay must not
    // need them (the checkpoint IS their compaction)
    (0L to 5L).foreach(v =>
      Files.delete(Paths.get(dir, "_delta_log", f"$v%020d.json")))
    val after = DeltaLog.read(spark, dir)
    assert(after.count() == 70)
    val head60 = DeltaLog.read(spark, dir, version = Some(5L))
      .agg(sum("id"), count(lit(1))).head()
    assert(head60 == full, "checkpoint-based snapshot equals the JSON replay it compacted")
  }

  test("a torn log (missing commit below target, no checkpoint) refuses typed") {
    val dir = s"${tmpDir()}/tbl"
    DeltaLog.commitAppend(spark, dir, nums(0, 10), timestampMs = 1000L)
    DeltaLog.commitAppend(spark, dir, nums(10, 20), timestampMs = 2000L)
    Files.delete(Paths.get(dir, "_delta_log", f"${0L}%020d.json"))
    val e = intercept[GraftError.Plan](DeltaLog.read(spark, dir).count())
    assert(e.getMessage.contains("torn"))
  }

  test("timestamp time travel picks the newest commit at or before ts") {
    val dir = s"${tmpDir()}/tbl"
    DeltaLog.commitAppend(spark, dir, nums(0, 10), timestampMs = 1000L)
    DeltaLog.commitAppend(spark, dir, nums(10, 30), timestampMs = 5000L)
    assert(DeltaLog.versionAsOf(dir, 1000L) == 0L)
    assert(DeltaLog.versionAsOf(dir, 4999L) == 0L)
    assert(DeltaLog.versionAsOf(dir, 5000L) == 1L)
    assert(DeltaLog.readAsOf(spark, dir, 4999L).count() == 10)
    intercept[GraftError.Plan](DeltaLog.versionAsOf(dir, 999L))
  }

  test("partitioned layout: values live in the log, files do not carry the column, reads inject it") {
    val dir = s"${tmpDir()}/tbl"
    DeltaLog.commitAppend(spark, dir, nums(0, 70), timestampMs = 1000L,
      partitionBy = Seq("bucket"))
    val snap = DeltaLog.snapshot(spark, dir)
    assert(snap.meta.partitionColumns == Seq("bucket"))
    assert(snap.files.forall(_.partitionValues.contains("bucket")))
    // physical files must NOT contain the partition column (protocol rule)
    val physical = spark.read.parquet(
      Paths.get(dir, snap.files.head.path).toString)
    assert(!physical.schema.fieldNames.contains("bucket"))
    val back = DeltaLog.read(spark, dir)
    assert(back.schema.fieldNames.toSeq == Seq("id", "tag", "bucket"))
    assert(back.groupBy("bucket").count().count() == 7)
    assert(back.agg(sum("id")).head().getLong(0) == (0L until 70L).sum)
  }

  test("partition pruning: an equality filter keeps only that partition's files") {
    val dir = s"${tmpDir()}/tbl"
    DeltaLog.commitAppend(spark, dir, nums(0, 70), timestampMs = 1000L,
      partitionBy = Seq("bucket"))
    val (_, all) = DeltaLog.planFiles(spark, dir)
    val (_, pruned) = DeltaLog.planFiles(spark, dir,
      filters = Seq(flt.EqualTo("bucket", 3)))
    assert(pruned.nonEmpty && pruned.size < all.size)
    assert(pruned.forall(_.partitionValues("bucket").contains("3")))
    val rows = DeltaLog.read(spark, dir, filters = Seq(flt.EqualTo("bucket", 3)))
    assert(rows.select("bucket").distinct().collect().map(_.getInt(0)).toSeq == Seq(3))
  }

  test("stats pruning: range predicates skip files by footer bounds, conservative without stats") {
    val dir = s"${tmpDir()}/tbl"
    val clustered = nums(0, 1000).repartitionByRange(8, col("id"))
    DeltaLog.commitAppend(spark, dir, clustered, timestampMs = 1000L)
    val (_, all) = DeltaLog.planFiles(spark, dir)
    assert(all.size >= 4, s"expected multiple files, got ${all.size}")
    val (_, pruned) = DeltaLog.planFiles(spark, dir,
      filters = Seq(flt.LessThan("id", 100L)))
    assert(pruned.nonEmpty && pruned.size < all.size,
      s"stats pruning fired: ${pruned.size}/${all.size}")
    // pruned read is still exact
    assert(DeltaLog.read(spark, dir, filters = Seq(flt.LessThan("id", 100L)))
      .filter(col("id") < 100).count() == 100)
    // a file whose stats were stripped is conservatively KEPT
    val snap = DeltaLog.snapshot(spark, dir)
    val noStats = snap.files.map(_.copy(stats = None))
    assert(noStats.forall(a =>
      DeltaLog.statsMayMatch(flt.LessThan("id", -1L), a, snap.meta.schema)))
  }

  test("OPTIMIZE ZORDER BY: range predicates prune on EVERY z column; content and incremental unchanged") {
    import spark.implicits._
    val dir = s"${tmpDir()}/tbl"
    // two independent dimensions, hash-scattered so that before the
    // z-order rewrite every file spans both full domains (no pruning)
    val data = (0 until 2000)
      .map(i => (i.toLong, ((i * 48271) % 2000).toLong, s"r$i"))
      .toDF("x", "y", "tag").repartition(8, col("tag"))
    DeltaLog.commitAppend(spark, dir, data, timestampMs = 1000L)
    val fX = Seq(flt.LessThan("x", 250L): flt.Filter)
    val fY = Seq(flt.LessThan("y", 250L): flt.Filter)
    val (_, before) = DeltaLog.planFiles(spark, dir)
    assert(DeltaLog.planFiles(spark, dir, filters = fX)._2.size == before.size,
      "hash-scattered layout must NOT prune (the baseline the rewrite beats)")
    DeltaLog.compact(spark, dir, timestampMs = 2000L, targetFiles = 8,
      zorderBy = Seq("x", "y"))
    val (_, all) = DeltaLog.planFiles(spark, dir)
    val (_, px) = DeltaLog.planFiles(spark, dir, filters = fX)
    val (_, py) = DeltaLog.planFiles(spark, dir, filters = fY)
    assert(px.nonEmpty && px.size < all.size, s"x pruning: ${px.size}/${all.size}")
    assert(py.nonEmpty && py.size < all.size, s"y pruning: ${py.size}/${all.size}")
    // the rewrite is a logical no-op: same rows, invisible to incremental
    assert(DeltaLog.read(spark, dir).count() == 2000)
    assert(DeltaLog.read(spark, dir, filters = fX).filter(col("x") < 250).count() == 250)
    assert(DeltaLog.readIncremental(spark, dir, fromVersion = 0L, toVersion = 1L)
      .count() == 0, "OPTIMIZE ZORDER commits dataChange=false on both sides")
  }

  test("incremental append-diff: (v0, v2] sees only the appends, compaction is invisible, removes refuse") {
    val dir = s"${tmpDir()}/tbl"
    DeltaLog.commitAppend(spark, dir, nums(0, 50), timestampMs = 1000L)   // v0
    DeltaLog.commitAppend(spark, dir, nums(50, 80), timestampMs = 2000L)  // v1
    DeltaLog.compact(spark, dir, timestampMs = 3000L)                     // v2: dataChange=false
    val inc = DeltaLog.readIncremental(spark, dir, fromVersion = 0L, toVersion = 2L)
    assert(inc.count() == 30, "compaction housekeeping contributes no incremental rows")
    assert(inc.agg(min("id"), max("id")).head().toSeq == Seq(50L, 79L))
    // full read after compaction is unchanged
    assert(DeltaLog.read(spark, dir).count() == 80)
    DeltaLog.deleteWhere(spark, dir, col("id") < 10, timestampMs = 4000L) // v3
    val e = intercept[GraftError.Plan](
      DeltaLog.readIncremental(spark, dir, fromVersion = 2L, toVersion = 3L))
    assert(e.getMessage.contains("removes data"))
  }

  test("deletion vectors: merge-on-read delete, superseding re-delete, OPTIMIZE purge, checkpoint round-trip") {
    import graft.sources.DeltaDv
    val dir = s"${tmpDir()}/tbl"
    DeltaLog.commitAppend(spark, dir, nums(0, 1000).repartition(4), timestampMs = 1000L)
    val pathsBefore = DeltaLog.snapshot(spark, dir).files.map(_.path).toSet
    DeltaLog.deleteWhereDv(spark, dir, col("id") % 10 === 3, timestampMs = 2000L)
    val snap = DeltaLog.snapshot(spark, dir)
    assert(snap.protocolMinReader == 3 &&
      snap.readerFeatures == Set("deletionVectors"))
    // merge-on-read: the SAME physical files stay live, vectors on top
    assert(snap.files.map(_.path).toSet == pathsBefore)
    assert(snap.files.map(_.deletionVector.map(_.cardinality).getOrElse(0L)).sum == 100)
    assert(DeltaLog.read(spark, dir).count() == 900)
    assert(DeltaLog.read(spark, dir).filter(col("id") % 10 === 3).count() == 0)
    // a second DV delete SUPERSEDES: one vector per file, old ∪ new
    DeltaLog.deleteWhereDv(spark, dir, col("id") % 10 === 7, timestampMs = 3000L)
    val snap2 = DeltaLog.snapshot(spark, dir)
    assert(snap2.files.map(_.deletionVector.map(_.cardinality).getOrElse(0L)).sum == 200)
    assert(DeltaLog.read(spark, dir).count() == 800)
    // checkpoint round-trips descriptors and the v3 feature protocol
    DeltaLog.checkpoint(spark, dir)
    val viaCp = DeltaLog.snapshot(spark, dir)
    assert(viaCp.protocolMinReader == 3 &&
      viaCp.files.map(_.deletionVector.map(_.cardinality).getOrElse(0L)).sum == 200)
    assert(DeltaLog.read(spark, dir).count() == 800)
    // copy-on-write OPTIMIZE materializes survivors and purges vectors
    DeltaLog.compact(spark, dir, timestampMs = 4000L, targetFiles = 2)
    val snap3 = DeltaLog.snapshot(spark, dir)
    assert(snap3.files.forall(_.deletionVector.isEmpty))
    assert(DeltaLog.read(spark, dir).count() == 800)
    // codec laws: z85 uuid round-trip; CRC refuses a torn vector
    val u = java.util.UUID.fromString("12345678-9abc-def0-1234-56789abcdef0")
    assert(DeltaDv.decodeUuid(DeltaDv.encodeUuid(u)) == u)
    val dvDir = s"${tmpDir()}/dv"
    Files.createDirectories(Paths.get(dvDir))
    val positions = (0L until 5000L).map(_ * 3).toArray // bitmap-container card
    val (ref, stored) = DeltaDv.writeDvFile(dvDir, Seq(positions, Array(1L, 2L)))
    assert(stored.head.cardinality == 5000 && stored(1).cardinality == 2)
    val back = DeltaDv.readDv(dvDir, "u", ref, stored.head.offset, stored.head.sizeInBytes)
    assert(back.toSeq == positions.toSeq)
    val dvPath = DeltaDv.dvFilePath(dvDir, ref)
    val bytes = Files.readAllBytes(dvPath)
    bytes(stored.head.offset.toInt + 10) = (bytes(stored.head.offset.toInt + 10) ^ 0x7).toByte
    Files.write(dvPath, bytes)
    val torn = intercept[GraftError.Plan](
      DeltaDv.readDv(dvDir, "u", ref, stored.head.offset, stored.head.sizeInBytes))
    assert(torn.getMessage.contains("CRC") || torn.getMessage.contains("magic"))
    // inline / absolute storage types refuse typed
    val st = intercept[GraftError.Plan](DeltaDv.readDv(dvDir, "i", ref, 1L, 4L))
    assert(st.getMessage.contains("storageType"))
  }

  test("deletion vectors: incremental windows refuse, partitioned tables route to copy-on-write") {
    val dir = s"${tmpDir()}/tbl"
    DeltaLog.commitAppend(spark, dir, nums(0, 100), timestampMs = 1000L)   // v0
    DeltaLog.commitAppend(spark, dir, nums(100, 200), timestampMs = 2000L) // v1
    DeltaLog.deleteWhereDv(spark, dir, col("id") === 5L, timestampMs = 3000L) // v2
    // the DV commit removes data from the window — append-diff refuses
    val e = intercept[GraftError.Plan](
      DeltaLog.readIncremental(spark, dir, fromVersion = 0L, toVersion = 2L).count())
    assert(e.getMessage.contains("removes data"))
    // windows before the delete still work
    assert(DeltaLog.readIncremental(spark, dir, fromVersion = 0L, toVersion = 1L)
      .count() == 100)
    val pdir = s"${tmpDir()}/ptbl"
    DeltaLog.commitAppend(spark, pdir, nums(0, 50), timestampMs = 1000L,
      partitionBy = Seq("bucket"))
    val p = intercept[GraftError.Plan](
      DeltaLog.deleteWhereDv(spark, pdir, col("id") === 1L, timestampMs = 2000L))
    assert(p.getMessage.contains("partitioned"))
  }

  test("column mapping (name mode): physical parquet names, logical reads, metadata-only rename, stats pruning") {
    import scala.jdk.CollectionConverters._
    val dir = s"${tmpDir()}/tbl"
    DeltaLog.commitAppend(spark, dir,
      nums(0, 400).repartitionByRange(4, col("id")), timestampMs = 1000L,
      columnMapping = true)
    val snap = DeltaLog.snapshot(spark, dir)
    assert(snap.protocolMinReader == 2)
    assert(snap.meta.configuration("delta.columnMapping.mode") == "name")
    // the parquet files carry PHYSICAL names, not logical ones
    val aFile = Paths.get(dir, snap.files.head.path).toString
    val physCols = spark.read.parquet(aFile).columns.toSet
    assert(physCols == Set("col-1", "col-2", "col-3"), s"physical: $physCols")
    // reads translate back to logical names and exact values
    val back = DeltaLog.read(spark, dir)
    assert(back.columns.toSeq == Seq("id", "tag", "bucket"))
    assert(back.count() == 400 &&
      back.filter(col("tag") === "row7").select("id").head().getLong(0) == 7L)
    // stats pruning fires with LOGICAL filter names (stats key physically)
    val (_, all) = DeltaLog.planFiles(spark, dir)
    val (_, pruned) = DeltaLog.planFiles(spark, dir,
      filters = Seq(flt.LessThan("id", 50L)))
    assert(pruned.nonEmpty && pruned.size < all.size)
    // appends to the mapped table keep working (logical column names in)
    DeltaLog.commitAppend(spark, dir, nums(400, 500), timestampMs = 2000L)
    assert(DeltaLog.read(spark, dir).count() == 500)
    // metadata-only rename: no data file changes, new logical name reads
    val filesBefore = DeltaLog.snapshot(spark, dir).files.map(_.path).toSet
    DeltaLog.renameColumn(spark, dir, "tag", "label", timestampMs = 3000L)
    assert(DeltaLog.snapshot(spark, dir).files.map(_.path).toSet == filesBefore)
    val renamed = DeltaLog.read(spark, dir)
    assert(renamed.columns.toSeq == Seq("id", "label", "bucket"))
    assert(renamed.filter(col("label") === "row7").count() == 1)
    // rename refuses on unmapped tables
    val plainDir = s"${tmpDir()}/plain"
    DeltaLog.commitAppend(spark, plainDir, nums(0, 10), timestampMs = 1000L)
    val e = intercept[GraftError.Plan](
      DeltaLog.renameColumn(spark, plainDir, "tag", "label", 2000L))
    assert(e.getMessage.contains("column mapping"))
  }

  test("vacuum: retention-gated tombstone deletion, re-added paths survive, superseded DVs reclaimed") {
    val dir = s"${tmpDir()}/tbl"
    DeltaLog.commitAppend(spark, dir, nums(0, 200).repartition(2), timestampMs = 1000L)
    val v0Files = DeltaLog.snapshot(spark, dir).files.map(_.path)
    // copy-on-write delete rewrites every touched file (tombstones at ts=2000)
    DeltaLog.deleteWhere(spark, dir, col("id") < 50, timestampMs = 2000L)
    // inside retention: nothing deleted
    assert(DeltaLog.vacuum(spark, dir, asOfMs = 2500L, retentionMs = 1000L).isEmpty)
    assert(v0Files.forall(p => Files.exists(Paths.get(dir, p))))
    // past retention: the rewritten originals go, the live set is untouched
    val gone = DeltaLog.vacuum(spark, dir, asOfMs = 10000L, retentionMs = 1000L)
    assert(gone.nonEmpty && gone.forall(v0Files.contains))
    assert(DeltaLog.read(spark, dir).count() == 150)
    // time travel that needs a vacuumed file now fails loudly, never silently
    intercept[Exception](DeltaLog.read(spark, dir, version = Some(0L)).count())
    // superseded DV file: first DV delete's bin is unreferenced after the second
    val dvDir = s"${tmpDir()}/dvtbl"
    DeltaLog.commitAppend(spark, dvDir, nums(0, 100), timestampMs = 1000L)
    DeltaLog.deleteWhereDv(spark, dvDir, col("id") === 1L, timestampMs = 2000L)
    DeltaLog.deleteWhereDv(spark, dvDir, col("id") === 2L, timestampMs = 3000L)
    def dvBins = {
      import scala.jdk.CollectionConverters._
      val s = Files.list(Paths.get(dvDir))
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith("deletion_vector_")).toVector
      finally s.close()
    }
    assert(dvBins.size == 2)
    val reclaimed = DeltaLog.vacuum(spark, dvDir,
      asOfMs = System.currentTimeMillis() + 1000000L, retentionMs = 0L)
    assert(dvBins.size == 1, s"superseded DV reclaimed, got $reclaimed")
    assert(DeltaLog.read(spark, dvDir).count() == 98)
  }

  test("protocol gate: minReaderVersion > 1 refuses typed") {
    val dir = s"${tmpDir()}/tbl"
    DeltaLog.commitAppend(spark, dir, nums(0, 10), timestampMs = 1000L)
    val p = Paths.get(dir, "_delta_log", f"${0L}%020d.json")
    val patched = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      .replace("\"minReaderVersion\":1", "\"minReaderVersion\":3")
    Files.write(p, patched.getBytes(StandardCharsets.UTF_8))
    val e = intercept[GraftError.Plan](DeltaLog.read(spark, dir).count())
    assert(e.getMessage.contains("reader version 3"))
  }

  test("optimistic concurrency: the loser of a version race gets a typed conflict") {
    val dir = s"${tmpDir()}/tbl"
    DeltaLog.commitAppend(spark, dir, nums(0, 10), timestampMs = 1000L)
    val line = "{\"commitInfo\":{\"timestamp\":1500,\"operation\":\"WRITE\"}}"
    // two writers race the same next version: the first atomic claim
    // wins, the second gets the typed conflict
    DeltaLog.publishCommit(dir, 1L, Seq(line))
    val e = intercept[GraftError.Plan](DeltaLog.publishCommit(dir, 1L, Seq(line)))
    assert(e.getMessage.contains("concurrently"))
    // a writer that instead RE-READS the log builds on the new head
    assert(DeltaLog.commitAppend(spark, dir, nums(10, 20), timestampMs = 2000L) == 2L)
    assert(DeltaLog.read(spark, dir).count() == 20)
  }

  test("appends never fork the schema") {
    val dir = s"${tmpDir()}/tbl"
    DeltaLog.commitAppend(spark, dir, nums(0, 10), timestampMs = 1000L)
    import spark.implicits._
    val other = Seq((1L, "x")).toDF("id", "other")
    val e = intercept[GraftError.Plan](
      DeltaLog.commitAppend(spark, dir, other, timestampMs = 2000L))
    assert(e.getMessage.contains("schema"))
  }

  test("null partition values round-trip through the hive default marker") {
    val dir = s"${tmpDir()}/tbl"
    import spark.implicits._
    val df = Seq((1L, Some("us")), (2L, None), (3L, Some("eu")))
      .toDF("id", "region")
    DeltaLog.commitAppend(spark, dir, df, timestampMs = 1000L,
      partitionBy = Seq("region"))
    val snap = DeltaLog.snapshot(spark, dir)
    assert(snap.files.exists(_.partitionValues("region").isEmpty),
      "null partition recorded as JSON null in the log")
    val back = DeltaLog.read(spark, dir).orderBy("id").collect()
    assert(back.map(r => Option(r.getString(1))).toSeq ==
      Seq(Some("us"), None, Some("eu")))
    // IsNull filter plans exactly the null partition's files
    val (_, nullFiles) = DeltaLog.planFiles(spark, dir,
      filters = Seq(flt.IsNull("region")))
    assert(nullFiles.forall(_.partitionValues("region").isEmpty))
  }

  test("DV file names are content-addressed over the full payload — a superseding vector sharing the old prefix lands in a NEW file") {
    import graft.sources.DeltaDv
    val d = s"${tmpDir()}/dvnames"
    Files.createDirectories(Paths.get(d))
    // Same first 4 positions; the superseding (merged old ∪ new) vector only
    // appends AFTER them. A name derived from the first-4 prefix would collide
    // and the atomic move would destroy the still-referenced first file.
    val (ref1, s1) = DeltaDv.writeDvFile(d, Seq(Array(1L, 2L, 3L, 4L, 5L)))
    val (ref2, s2) = DeltaDv.writeDvFile(d, Seq(Array(1L, 2L, 3L, 4L, 5L, 100L)))
    assert(ref1 != ref2, "superseding vector must get its own file")
    // both payloads remain intact and readable
    assert(DeltaDv.readDv(d, "u", ref1, s1.head.offset, s1.head.sizeInBytes).toSeq ==
      Seq(1L, 2L, 3L, 4L, 5L))
    assert(DeltaDv.readDv(d, "u", ref2, s2.head.offset, s2.head.sizeInBytes).toSeq ==
      Seq(1L, 2L, 3L, 4L, 5L, 100L))
    // identical payload → identical name, overwrite harmless by construction
    val (ref3, _) = DeltaDv.writeDvFile(d, Seq(Array(1L, 2L, 3L, 4L, 5L)))
    assert(ref3 == ref1)
    // end-to-end: time travel to the superseded DV version still reads the OLD vector
    val dir = s"${tmpDir()}/tbl"
    DeltaLog.commitAppend(spark, dir, nums(0, 1000).repartition(1), timestampMs = 1000L)
    DeltaLog.deleteWhereDv(spark, dir, col("id") < 10, timestampMs = 2000L)   // v1
    DeltaLog.deleteWhereDv(spark, dir, col("id") >= 990, timestampMs = 3000L) // v2
    assert(DeltaLog.read(spark, dir, version = Some(1L)).count() == 990)
    assert(DeltaLog.read(spark, dir).count() == 980)
  }

  test("checkpoint writes the writer protocol verbatim: column-mapping v5 and v7 feature lists survive log cleanup") {
    // column-mapping table: protocol (reader 2, writer 5), no feature lists
    val dir = s"${tmpDir()}/cmtbl"
    DeltaLog.commitAppend(spark, dir, nums(0, 50), timestampMs = 1000L,
      columnMapping = true)
    DeltaLog.commitAppend(spark, dir, nums(50, 80), timestampMs = 2000L)
    DeltaLog.checkpoint(spark, dir)
    Files.delete(Paths.get(dir, "_delta_log", f"${0L}%020d.json"))
    Files.delete(Paths.get(dir, "_delta_log", f"${1L}%020d.json"))
    val snap = DeltaLog.snapshot(spark, dir)
    assert(snap.protocolMinReader == 2 && snap.protocolMinWriter == 5,
      "a column-mapping table must not checkpoint as writer version 2")
    assert(DeltaLog.read(spark, dir).count() == 80)
    // DV table: protocol (3, 7) with BOTH feature lists (required at v3/v7)
    val dvt = s"${tmpDir()}/dvtbl"
    DeltaLog.commitAppend(spark, dvt, nums(0, 100), timestampMs = 1000L)
    DeltaLog.deleteWhereDv(spark, dvt, col("id") === 1L, timestampMs = 2000L)
    DeltaLog.checkpoint(spark, dvt)
    val cp = spark.read.parquet(
      s"$dvt/_delta_log/${f"${1L}%020d"}.checkpoint.parquet")
    val prot = cp.filter(col("protocol").isNotNull).select("protocol.*").head()
    assert(prot.getAs[Int]("minReaderVersion") == 3 &&
      prot.getAs[Int]("minWriterVersion") == 7)
    assert(prot.getSeq[String](prot.fieldIndex("readerFeatures")).toSeq ==
      Seq("deletionVectors"))
    assert(prot.getSeq[String](prot.fieldIndex("writerFeatures")).toSeq ==
      Seq("deletionVectors"),
      "v7 checkpoints without writerFeatures are malformed per PROTOCOL.md")
    Files.delete(Paths.get(dvt, "_delta_log", f"${0L}%020d.json"))
    Files.delete(Paths.get(dvt, "_delta_log", f"${1L}%020d.json"))
    val s2 = DeltaLog.snapshot(spark, dvt)
    assert(s2.protocolMinWriter == 7 && s2.writerFeatures == Set("deletionVectors"))
    assert(DeltaLog.read(spark, dvt).count() == 99)
  }

  test("explicit columnMapping.mode = 'none' reads as v1/v2 (protocol default, not a refusal)") {
    val dir = s"${tmpDir()}/tbl"
    DeltaLog.commitAppend(spark, dir, nums(0, 20), timestampMs = 1000L)
    // materialize the protocol-default mode explicitly, as real writers do
    val p = Paths.get(dir, "_delta_log", f"${0L}%020d.json")
    val patched = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      .replace("\"configuration\":{}",
        "\"configuration\":{\"delta.columnMapping.mode\":\"none\"}")
    Files.write(p, patched.getBytes(StandardCharsets.UTF_8))
    assert(DeltaLog.read(spark, dir).count() == 20)
    // genuinely unimplemented modes still refuse typed
    val patched2 = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      .replace("\"none\"", "\"id\"")
    Files.write(p, patched2.getBytes(StandardCharsets.UTF_8))
    val e = intercept[GraftError.Plan](DeltaLog.read(spark, dir).count())
    assert(e.getMessage.contains("column mapping mode id"))
  }

  test("vacuum reclaims files whose remove actions predate the checkpoint (tombstones ride the checkpoint)") {
    val dir = s"${tmpDir()}/tbl"
    DeltaLog.commitAppend(spark, dir, nums(0, 200).repartition(2), timestampMs = 1000L)
    val v0Files = DeltaLog.snapshot(spark, dir).files.map(_.path)
    DeltaLog.deleteWhere(spark, dir, col("id") < 50, timestampMs = 2000L) // v1
    DeltaLog.checkpoint(spark, dir)
    // log cleanup removes the pre-checkpoint JSON commits — the checkpoint's
    // retained remove rows are now the only record of the tombstones
    Files.delete(Paths.get(dir, "_delta_log", f"${0L}%020d.json"))
    Files.delete(Paths.get(dir, "_delta_log", f"${1L}%020d.json"))
    val gone = DeltaLog.vacuum(spark, dir, asOfMs = 10000L, retentionMs = 1000L)
    assert(gone.nonEmpty && gone.forall(v0Files.contains),
      "pre-checkpoint removes must remain reclaimable (no permanent storage leak)")
    assert(v0Files.forall(p => !Files.exists(Paths.get(dir, p))))
    assert(DeltaLog.read(spark, dir).count() == 150)
  }
}
