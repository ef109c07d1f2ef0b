package graft

import org.apache.spark.sql.functions._

import graft.core.{Ledger, Position}
import graft.sources.IcebergSource

/** Iceberg-spec table conformance: snapshot-pinned scans, incremental
  * append-diff, resume replay identity through typed snapshot
  * positions (cdf: crates/cdf-source-iceberg/src/driver.rs:1035). */
class IcebergSpec extends SparkSpec {

  private def nums(lo: Int, hi: Int) = {
    import spark.implicits._
    (lo until hi).map(i => (i.toLong, s"row$i", i * 1.5)).toDF("id", "tag", "v")
  }

  test("two snapshots: full scan unions, incremental reads only the appended diff") {
    val dir = s"${tmpDir()}/tbl"
    val m1 = IcebergSource.commitAppend(spark, dir, nums(0, 100), snapshotId = 11L,
      timestampMs = 1700000000000L)
    assert(m1.version == 1 && m1.currentSnapshotId.contains(11L))

    val m2 = IcebergSource.commitAppend(spark, dir, nums(100, 130), snapshotId = 22L,
      timestampMs = 1700000001000L)
    assert(m2.version == 2)
    assert(m2.snapshot(22L).parentId.contains(11L), "snapshot lineage recorded")

    // current = union of both snapshots
    val full = IcebergSource.read(spark, dir)
    assert(full.count() == 130)
    // time travel: pinned at snapshot 11
    assert(IcebergSource.read(spark, dir, Some(11L)).count() == 100)
    // incremental (11, 22] = exactly the second append
    val inc = IcebergSource.readIncremental(spark, dir, Some(11L), 22L)
    assert(inc.count() == 30)
    assert(inc.agg(min("id"), max("id")).head().toSeq == Seq(100L, 129L))
    // bootstrap incremental (None, 22] = everything
    assert(IcebergSource.readIncremental(spark, dir, None, 22L).count() == 130)
  }

  test("partitioned table: values surface as columns, manifests prune file scans, incremental diff composes") {
    import org.apache.spark.sql.{sources => sqs}
    import spark.implicits._
    val dir = s"${tmpDir()}/tbl"
    val day1 = (0 until 60).map(i => (i.toLong, Seq("us", "eu", "ap")(i % 3), i * 1.5))
      .toDF("id", "region", "v")
    val m1 = IcebergSource.commitAppend(spark, dir, day1, 1L, 1L,
      partitionBy = Seq("region"))
    assert(m1.partitionFields == Seq("region"))
    // the spec survives the metadata round-trip
    assert(IcebergSource.readMeta(dir).partitionFields == Seq("region"))

    // identity partition values are REAL columns in the data files
    val full = IcebergSource.read(spark, dir)
    assert(full.count() == 60)
    assert(full.columns.toSet == Set("id", "region", "v"))
    assert(full.filter($"region" === "eu").count() == 20)

    // manifest entries carry per-file partition values
    val files = IcebergSource.dataFiles(dir)
    assert(files.forall(_.partition.keySet == Set("region")))
    assert(files.map(_.partition("region")).toSet == Set("us", "eu", "ap"))

    // pruning: an equality predicate plans ONLY that partition's files
    val pruned = IcebergSource.dataFiles(dir, filters = Seq(sqs.EqualTo("region", "eu")))
    assert(pruned.nonEmpty && pruned.forall(_.partition("region") == "eu"))
    assert(pruned.size < files.size, "pruning must skip other partitions' files")
    // ...and the pruned read still returns exactly the right rows
    val prunedRead = IcebergSource.read(spark, dir,
      filters = Seq(sqs.EqualTo("region", "eu"))).filter($"region" === "eu")
    assert(prunedRead.count() == 20)
    // column bounds (footer stats recorded in the manifests) prune
    // files even on NON-partition columns — and the read stays exact
    val idFiles = IcebergSource.dataFiles(dir, filters = Seq(sqs.EqualTo("id", 7L)))
    assert(idFiles.nonEmpty && idFiles.size < files.size,
      "manifest column bounds must prune non-partition predicates")
    assert(IcebergSource.read(spark, dir, filters = Seq(sqs.EqualTo("id", 7L)))
      .filter($"id" === 7L).count() == 1)
    // In / range / And compose
    assert(IcebergSource.dataFiles(dir,
      filters = Seq(sqs.In("region", Array("us", "ap")))).forall(f =>
        Set("us", "ap")(f.partition("region").asInstanceOf[String])))
    assert(IcebergSource.dataFiles(dir,
      filters = Seq(sqs.And(sqs.EqualTo("region", "us"), sqs.EqualTo("id", 3L))))
      .forall(_.partition("region") == "us"))

    // second snapshot inherits the spec without repeating partitionBy
    val day2 = (60 until 90).map(i => (i.toLong, Seq("us", "eu")(i % 2), i * 1.5))
      .toDF("id", "region", "v")
    val m2 = IcebergSource.commitAppend(spark, dir, day2, 2L, 2L)
    assert(m2.partitionFields == Seq("region"))

    // incremental diff reads only the appended files; pruned incremental
    // restricts to the partition inside the diff
    val inc = IcebergSource.readIncremental(spark, dir, Some(1L), 2L)
    assert(inc.count() == 30)
    val incPruned = IcebergSource.readIncremental(spark, dir, Some(1L), 2L,
      filters = Seq(sqs.EqualTo("region", "eu"))).filter($"region" === "eu")
    assert(incPruned.count() == 15)
    val incFiles = IcebergSource.addedFiles(dir, Some(1L), 2L,
      filters = Seq(sqs.EqualTo("region", "eu")))
    assert(incFiles.size < IcebergSource.addedFiles(dir, Some(1L), 2L).size)

    // time travel on the partitioned table still pins correctly
    assert(IcebergSource.read(spark, dir, Some(1L)).count() == 60)
  }

  test("manifest stats are real: per-file record counts sum to the table count") {
    val dir = s"${tmpDir()}/tbl"
    IcebergSource.commitAppend(spark, dir, nums(0, 57).repartition(3), 1L, 1L)
    val files = IcebergSource.dataFiles(dir)
    assert(files.map(_.recordCount).sum == 57)
    assert(files.forall(_.sizeBytes > 0))
    assert(files.size == 3, "one data file per write partition")
  }

  test("resume replay identity: snapshot cursor in the ledger drives the incremental scan") {
    val dir = s"${tmpDir()}/tbl"
    val out = tmpDir()
    val ledger = Ledger.at(out)
    IcebergSource.commitAppend(spark, dir, nums(0, 40), 1L, 1L)

    // first run: bootstrap from None, commit position = snapshot 1
    val meta1 = IcebergSource.readMeta(dir)
    val run1 = IcebergSource.readIncremental(spark, dir, None, meta1.currentSnapshotId.get)
    assert(run1.count() == 40)
    ledger.propose("ice", "scan", "pkg1", Some(Position.Cursor("snapshot_id", 1L)))
    ledger.commit("ice", "scan", "pkg1", """{"rows":40}""")

    // table advances twice
    IcebergSource.commitAppend(spark, dir, nums(40, 70), 2L, 2L)
    IcebergSource.commitAppend(spark, dir, nums(70, 85), 3L, 3L)

    // resume: typed position round-trips through the ledger; the
    // incremental scan covers BOTH missed snapshots via lineage
    val pos = ledger.resumePosition("ice", "scan")
    assert(pos == Some(Position.Cursor("snapshot_id", 1L)))
    val from = pos.collect { case Position.Cursor(_, v) => v }
    val meta2 = IcebergSource.readMeta(dir)
    val run2 = IcebergSource.readIncremental(spark, dir, from, meta2.currentSnapshotId.get)
    assert(run2.count() == 45)
    assert(run2.agg(min("id"), max("id")).head().toSeq == Seq(40L, 84L))

    // replay of the same (from, to] window is bit-identical
    val replay = IcebergSource.readIncremental(spark, dir, from, meta2.currentSnapshotId.get)
    assert(graft.pkg.PackageWriter.contentHash(replay)
      == graft.pkg.PackageWriter.contentHash(run2))
  }

  test("composes with the Runner spine: incremental scans merge through ledger-settled runs") {
    import graft.contract.{ContractPolicy, RowRule}
    import graft.core.Descriptor
    import graft.run.Runner

    val tbl = s"${tmpDir()}/tbl"
    val base = tmpDir()
    val ledger = Ledger.at(base)
    def cfg(pos: Position) = Runner.RunConfig(
      descriptor = Descriptor.ResourceDescriptor(
        id = "ice_merge", schemaSource = Descriptor.SchemaSource.Discover,
        primaryKey = Seq("id"), cursor = None,
        disposition = Descriptor.Disposition.Merge(Seq("id"))),
      policy = ContractPolicy(Seq(RowRule.Nullability("nn_id", "id"))),
      orderColumns = Seq("id"),
      positionOverride = Some(pos))

    // run 1: bootstrap (None, snap 1]
    IcebergSource.commitAppend(spark, tbl, nums(0, 50), 1L, 1L)
    val inc1 = IcebergSource.readIncremental(spark, tbl, None, 1L)
    val r1 = Runner.run(spark, cfg(Position.Cursor("snapshot_id", 1L)), inc1,
      s"$base/pkg1", s"$base/dest", ledger)
    assert(r1.committed && r1.position == Some(Position.Cursor("snapshot_id", 1L)))

    // run 2: table advances; resume from the committed snapshot cursor
    IcebergSource.commitAppend(spark, tbl, nums(50, 70), 2L, 2L)
    val from = ledger.resumePosition("ice_merge", "root")
      .collect { case Position.Cursor("snapshot_id", v) => v }
    assert(from == Some(1L))
    val inc2 = IcebergSource.readIncremental(spark, tbl, from, 2L)
    assert(inc2.count() == 20, "second run reads only the append-diff")
    val r2 = Runner.run(spark, cfg(Position.Cursor("snapshot_id", 2L)), inc2,
      s"$base/pkg2", s"$base/dest", ledger)
    assert(r2.committed && !r2.duplicate)

    // the merged destination equals the table's current snapshot
    // (logical read: the bucketed-merge layout column is internal)
    val dest = Runner.readDest(spark, s"$base/dest")
    assert(dest.count() == 70)
    assert(graft.pkg.PackageWriter.contentHash(dest)
      == graft.pkg.PackageWriter.contentHash(IcebergSource.read(spark, tbl)))

    // replaying run 2 is a duplicate: nothing rewritten, cursor unchanged
    val r3 = Runner.run(spark, cfg(Position.Cursor("snapshot_id", 2L)), inc2,
      s"$base/pkg2", s"$base/dest", ledger)
    assert(r3.duplicate)
    assert(ledger.resumePosition("ice_merge", "root")
      == Some(Position.Cursor("snapshot_id", 2L)))
  }

  test("fidelity gate: inconsistent delete metadata and partitioned specs are rejected at plan time") {
    import org.apache.avro.Schema
    import org.apache.avro.file.{DataFileReader, DataFileWriter}
    import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
    import scala.jdk.CollectionConverters._

    // (a) a manifest FLAGGED content=1 (delete) whose entries are data
    // files — corrupt metadata; resolving it either way could
    // resurrect or drop rows
    val dir1 = s"${tmpDir()}/tbl"
    val m = IcebergSource.commitAppend(spark, dir1, nums(0, 10), 1L, 1L)
    val listPath = m.snapshot(1L).manifestList
    val reader = new DataFileReader[GenericRecord](new java.io.File(listPath),
      new GenericDatumReader[GenericRecord]())
    val (schema, recs) =
      try (reader.getSchema, reader.iterator().asScala.toVector) finally reader.close()
    val flipped = new GenericData.Record(schema)
    schema.getFields.asScala.foreach(f => flipped.put(f.name(), recs.head.get(f.name())))
    flipped.put("content", 1) // claims deletes, lists data
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, new java.io.File(listPath))
    w.append(flipped); w.close()
    val e1 = intercept[graft.core.GraftError.Plan](IcebergSource.dataFiles(dir1))
    assert(e1.getMessage.contains("inconsistent"))

    // (b) a delete-file entry (data_file.content=2) inside a DATA
    // manifest — same inconsistency, opposite direction
    val dir2 = s"${tmpDir()}/tbl"
    IcebergSource.commitAppend(spark, dir2, nums(0, 10), 1L, 1L)
    val manifestPath = s"$dir2/metadata/manifest-1.avro"
    val r2 = new DataFileReader[GenericRecord](new java.io.File(manifestPath),
      new GenericDatumReader[GenericRecord]())
    val (es, erecs) = try (r2.getSchema, r2.iterator().asScala.toVector) finally r2.close()
    erecs.head.get("data_file").asInstanceOf[GenericRecord].put("content", 2)
    val w2 = new DataFileWriter(new GenericDatumWriter[GenericRecord](es))
    w2.create(es, new java.io.File(manifestPath))
    erecs.foreach(w2.append); w2.close()
    val e2 = intercept[graft.core.GraftError.Plan](IcebergSource.dataFiles(dir2))
    assert(e2.getMessage.contains("inconsistent"))

    // (c) a NON-identity partitioned spec is READABLE (transforms only
    // decide layout/pruning — the data files carry the source columns)
    // and — since r8 — APPENDABLE: the writer computes the transform
    // values at append time. Truly UNKNOWN transforms still refuse.
    val dir3 = s"${tmpDir()}/tbl"
    IcebergSource.commitAppend(spark, dir3, nums(0, 10), 1L, 1L)
    val metaPath = java.nio.file.Paths.get(s"$dir3/metadata/v1.metadata.json")
    val metaJson = new String(java.nio.file.Files.readAllBytes(metaPath), "UTF-8")
    val partitioned = metaJson.replaceFirst("\\{",
      """{"partition-specs":[{"spec-id":0,"fields":[{"name":"id_bucket","transform":"bucket[16]","source-id":1,"field-id":1000}]}],"default-spec-id":0,""")
    java.nio.file.Files.write(metaPath, partitioned.getBytes("UTF-8"))
    val meta3 = IcebergSource.readMeta(dir3)
    // source-id 1 resolves through the (always-written) schema to the
    // real source column `id`
    assert(meta3.spec == Seq(IcebergSource.PartField("id_bucket", "id", "bucket[16]", Some(1L))))
    assert(IcebergSource.read(spark, dir3).count() == 10)
    // inherit-and-append: the new snapshot lays out spec buckets
    IcebergSource.commitAppend(spark, dir3, nums(10, 20), 2L, 2L)
    assert(IcebergSource.read(spark, dir3).count() == 20)
    val added = IcebergSource.addedFiles(dir3, Some(1L), 2L)
    assert(added.forall { f =>
      val b = f.partition("id_bucket").asInstanceOf[Int]
      b >= 0 && b < 16
    })
    // an UNKNOWN transform still refuses at append time
    val dir4 = s"${tmpDir()}/tbl"
    val e4 = intercept[graft.core.GraftError.Plan](
      IcebergSource.commitAppend(spark, dir4, nums(0, 10), 1L, 1L,
        partitionSpec = Seq(IcebergSource.PartField("z", "id", "zorder[4]"))))
    assert(e4.getMessage.contains("unknown transform"))
  }

  test("merge-on-read composes with partition pruning: deletes apply inside a pruned read") {
    import org.apache.spark.sql.{sources => sqs}
    import org.apache.spark.sql.functions.{col, expr}
    import spark.implicits._
    val dir = s"${tmpDir()}/tbl"
    val df = (0 until 60).map(i => (i.toLong, Seq("us", "eu", "ap")(i % 3), i * 1.5))
      .toDF("id", "region", "v")
    IcebergSource.commitAppend(spark, dir, df, 1L, 1L, partitionBy = Seq("region"))

    // delete ids 0..9 by position (coordinates from _metadata), and
    // region 'ap' rows with an equality delete on id ∈ committed rows?
    // -> equality delete on id: remove ids 30..34 wherever they live
    val paths = IcebergSource.dataFiles(dir).map(_.path)
    val posDf = spark.read.parquet(paths: _*)
      .select(col("id"), expr("_metadata.file_path").as("file_path"),
        expr("_metadata.row_index").as("pos"))
      .filter(col("id") < 10).select("file_path", "pos")
    val eqDf = (30L until 35L).toDF("id")
    IcebergSource.commitDeletes(spark, dir,
      posDeletes = Some(posDf), eqDeletes = Some((eqDf, Seq("id"))),
      snapshotId = 2L, timestampMs = 2L)

    val expect = (0 until 60).filter(i => i >= 10 && !(30 until 35).contains(i)).map(_.toLong).toSet
    assert(IcebergSource.read(spark, dir).select("id").as[Long].collect().toSet == expect)

    // a partition-PRUNED read still applies the deletes to the
    // surviving files (delete files are never pruned away with them)
    val pruned = IcebergSource.read(spark, dir, filters = Seq(sqs.EqualTo("region", "eu")))
      .filter($"region" === "eu")
    val expectEu = expect.filter(i => i % 3 == 1)
    assert(pruned.select("id").as[Long].collect().toSet == expectEu)
    // and the file plan really was pruned
    assert(IcebergSource.dataFiles(dir, filters = Seq(sqs.EqualTo("region", "eu"))).size
      < IcebergSource.dataFiles(dir).size)
  }

  test("transform-partitioned WRITE round-trip: bucket[4] + day lay out, prune and re-read exactly") {
    import org.apache.spark.sql.{sources => sqs}
    import spark.implicits._
    import IcebergSource.PartField
    val dir = s"${tmpDir()}/tbl"
    val df = (0 until 60).map { i =>
      (i.toLong, java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1 + i % 5)), s"row$i")
    }.toDF("id", "d", "tag")
    val spec = Seq(PartField("id_bucket", "id", "bucket[4]"), PartField("d_day", "d", "day"))
    IcebergSource.commitAppend(spark, dir, df, 1L, 1L, partitionSpec = spec)

    // spec round-trips through the metadata (source-ids resolved from
    // the schema on the way out)
    val meta = IcebergSource.readMeta(dir)
    assert(meta.spec.map(p => (p.name, p.source, p.transform)) ==
      spec.map(p => (p.name, p.source, p.transform)))
    assert(meta.spec.map(_.sourceId) == Seq(Some(1L), Some(2L)))

    // data files carry the REAL columns; the read is exact
    val back = IcebergSource.read(spark, dir)
    assert(back.columns.toSet == Set("id", "d", "tag"))
    assert(back.count() == 60)
    assert(back.select("id").as[Long].collect().toSet == (0L until 60L).toSet)

    // manifest partition values are the spec transforms
    val all = IcebergSource.dataFiles(dir)
    assert(all.forall { f =>
      val b = f.partition("id_bucket").asInstanceOf[Int]
      val day = f.partition("d_day").asInstanceOf[Long]
      b >= 0 && b < 4 && day >= 19723L && day < 19728L // 2024-01-01..05 epoch days
    })

    // bucket pruning: equality on id keeps ONLY files of bucketOf(id)
    val pruned = IcebergSource.dataFiles(dir, filters = Seq(sqs.EqualTo("id", 7L)))
    val b7 = IcebergSource.bucketOf(7L, 4).get
    assert(pruned.nonEmpty && pruned.size < all.size)
    assert(pruned.forall(_.partition("id_bucket") == b7))
    val prunedRead = IcebergSource.read(spark, dir, filters = Seq(sqs.EqualTo("id", 7L)))
      .filter($"id" === 7L)
    assert(prunedRead.count() == 1)

    // day pruning: equality on the date keeps only that day's files
    val d3 = java.sql.Date.valueOf("2024-01-03")
    val prunedD = IcebergSource.dataFiles(dir, filters = Seq(sqs.EqualTo("d", d3)))
    assert(prunedD.nonEmpty && prunedD.size < all.size)
    assert(prunedD.forall(_.partition("d_day") == 19725L))
    assert(IcebergSource.read(spark, dir, filters = Seq(sqs.EqualTo("d", d3)))
      .filter($"d" === d3).count() == 12)

    // a second append INHERITS the transform spec
    val df2 = (60 until 80).map { i =>
      (i.toLong, java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1 + i % 5)), s"row$i")
    }.toDF("id", "d", "tag")
    IcebergSource.commitAppend(spark, dir, df2, 2L, 2L)
    assert(IcebergSource.read(spark, dir).count() == 80)
    assert(IcebergSource.readMeta(dir).spec.map(p => (p.name, p.source, p.transform)) ==
      spec.map(p => (p.name, p.source, p.transform)))
  }

  test("merge-on-read deletes: position + equality files, sequence rules, time travel, incremental refusal") {
    import org.apache.spark.sql.functions.{col, expr}
    import spark.implicits._
    val dir = s"${tmpDir()}/tbl"
    // snapshot 1: ids 0..99
    IcebergSource.commitAppend(spark, dir, nums(0, 100), 1L, 1L)

    // snapshot 2 (DELETE): position deletes for id % 7 == 0, computed
    // from the parquet scan's own _metadata (the coordinates a real
    // engine's delta writer would record), plus an equality delete on
    // tag ∈ {row1, row2}
    val paths = IcebergSource.dataFiles(dir).map(_.path)
    val posDf = spark.read.parquet(paths: _*)
      .select(col("id"),
        expr("_metadata.file_path").as("file_path"),
        expr("_metadata.row_index").as("pos"))
      .filter(col("id") % 7 === 0)
      .select("file_path", "pos")
    val eqDf = Seq("row1", "row2").toDF("tag")
    IcebergSource.commitDeletes(spark, dir,
      posDeletes = Some(posDf), eqDeletes = Some((eqDf, Seq("tag"))),
      snapshotId = 2L, timestampMs = 2L)

    val afterDelete = IcebergSource.read(spark, dir)
    val expect1 = (0 until 100).filter(i => i % 7 != 0 && i != 1 && i != 2).map(_.toLong).toSet
    assert(afterDelete.select("id").as[Long].collect().toSet == expect1)

    // snapshot 3: re-adds id 1 (tag row1) and appends 100..109. Its
    // sequence number (3) is ABOVE the delete's (2), so neither delete
    // file touches the new rows — the v2 sequence rules, not wall-time.
    IcebergSource.commitAppend(spark, dir, nums(1, 2).unionByName(nums(100, 110)), 3L, 3L)
    val afterReadd = IcebergSource.read(spark, dir)
    val expect2 = expect1 ++ Set(1L) ++ (100L until 110L)
    assert(afterReadd.select("id").as[Long].collect().toSet == expect2)
    // id 1 present exactly once (the snap-3 copy; snap-1's stays eq-deleted)
    assert(afterReadd.filter(col("id") === 1).count() == 1)

    // time travel BEFORE the delete snapshot sees all 100 rows
    assert(IcebergSource.read(spark, dir, Some(1L)).count() == 100)

    // 100 TB plan shape: both delete applications are BROADCAST
    // anti-joins (delete files are small relative to data), and
    // nothing in the plan degenerates to a cartesian product
    val plan = afterReadd.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"merge-on-read deletes should broadcast-anti-join:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian in MoR plan:\n$plan")

    // the STRICT append-diff (addedFiles) still refuses a window
    // containing the delete snapshot — "files added" cannot represent
    // row removal
    val e = intercept[graft.core.GraftError.Plan](
      IcebergSource.addedFiles(dir, Some(1L), 3L))
    assert(e.getMessage.contains("append-diff"))
    assert(IcebergSource.readIncremental(spark, dir, Some(2L), 3L).count() == 11)

    // readIncremental over the SAME window now answers NET-CHANGES:
    // the window's added rows with the window's deletes applied.
    // (1, 3]: snap 3's rows (seq 3 outranks the seq-2 deletes) = 11
    val netWin = IcebergSource.readIncremental(spark, dir, Some(1L), 3L)
    assert(netWin.select("id").as[Long].collect().toSet ==
      Set(1L) ++ (100L until 110L), "net window = snap-3 adds, deletes outranked")
    // bootstrap window (None, 3] covers ALL snapshots: its net rows
    // must equal the full merge-on-read scan of the current table
    val netAll = IcebergSource.readIncremental(spark, dir, None, 3L)
    assert(netAll.select("id").as[Long].collect().toSet == expect2,
      "bootstrap net-changes must equal the full MoR scan")
    // a deletes-only window adds nothing
    assert(IcebergSource.readIncremental(spark, dir, Some(1L), 2L).count() == 0)
  }

  test("puffin codec: DV blob + portable roaring64 round-trip; spec-layout bytes decode; corruption rejected typed") {
    import graft.sources.Puffin
    // round-trip across container types and 32-bit buckets: >4096
    // values in key 0 forces a BITSET container, the 70k pair an
    // ARRAY container under a second 16-bit key, and the 2^32/2^33
    // values exercise multiple roaring64 buckets
    val positions = (0L until 5000L).map(_ * 2) ++ Seq(70000L, 70001L) ++
      Seq((1L << 32) + 5, (1L << 33) + 123, (1L << 33) + 123)
    val blob = Puffin.encodeDeletionVector(positions)
    assert(Puffin.decodeDeletionVector(blob).toSeq == positions.distinct.sorted)

    // HAND-BUILT vector per the public RoaringFormatSpec byte layout,
    // independent of our encoder — one bucket (high=0), SERIAL_COOKIE
    // 12347 with one RUN container: key=1, one run (start=10, len-1=2)
    // → values 65546, 65547, 65548. n=1 < 4 and runs present → no
    // offset header, per the spec.
    val vec = java.nio.ByteBuffer.allocate(8 + 4 + 4 + 1 + 4 + 2 + 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    vec.putLong(1L)            // roaring64 bucket count
    vec.putInt(0)              // bucket high bits
    vec.putInt(12347)          // cookie: run containers, n = (0 << 16) + 1
    vec.put(0x01.toByte)       // run bitset: container 0 is a run
    vec.putShort(1.toShort)    // container key
    vec.putShort(2.toShort)    // cardinality - 1
    vec.putShort(1.toShort)    // number of runs
    vec.putShort(10.toShort)   // run start
    vec.putShort(2.toShort)    // run length - 1
    val vecBytes = vec.array()
    val crc = new java.util.zip.CRC32()
    val dvMagic = Array[Byte](0xD1.toByte, 0xD3.toByte, 0x39, 0x64)
    crc.update(dvMagic); crc.update(vecBytes)
    val hand = java.nio.ByteBuffer.allocate(4 + 4 + vecBytes.length + 4)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    hand.putInt(4 + vecBytes.length).put(dvMagic).put(vecBytes)
      .putInt(crc.getValue.toInt)
    assert(Puffin.decodeDeletionVector(hand.array()).toSeq ==
      Seq(65546L, 65547L, 65548L))

    // corruption is rejected typed: flip one vector byte → CRC error
    val bad = hand.array().clone()
    bad(12) = (bad(12) ^ 0x40).toByte
    val e1 = intercept[graft.core.GraftError.Plan](Puffin.decodeDeletionVector(bad))
    assert(e1.getMessage.contains("CRC"))
    val e2 = intercept[graft.core.GraftError.Plan](
      Puffin.decodeDeletionVector(Array.fill[Byte](16)(0x11)))
    assert(e2.getMessage.contains("magic") || e2.getMessage.contains("length"))

    // LZ4-FRAMED footer (flag bit 0) — the one compression the spec
    // allows for footers; hand-built file, read back through the
    // same blob coordinates the footer declares
    val magic = Array[Byte]('P', 'F', 'A', '1')
    val dvb = Puffin.encodeDeletionVector(Seq(1L, 5L, 9L))
    val json =
      s"""{"blobs":[{"type":"deletion-vector-v1","fields":[],"offset":4,""" +
        s""""length":${dvb.length},"properties":{"referenced-data-file":"f1",""" +
        s""""cardinality":"3"}}],"properties":{}}"""
    val baos = new java.io.ByteArrayOutputStream()
    val lz = new net.jpountz.lz4.LZ4FrameOutputStream(baos)
    lz.write(json.getBytes("UTF-8")); lz.close()
    val comp = baos.toByteArray
    def writePuffin(path: String, flags: Int): Unit = {
      val out = new java.io.DataOutputStream(new java.io.FileOutputStream(path))
      out.write(magic); out.write(dvb); out.write(magic); out.write(comp)
      val t = java.nio.ByteBuffer.allocate(12).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      t.putInt(comp.length); t.putInt(flags); t.put(magic)
      out.write(t.array()); out.close()
    }
    val pf = s"${tmpDir()}/lz4.puffin"
    writePuffin(pf, flags = 1)
    val ftr = Puffin.readFooter(pf)
    assert(ftr.blobs.head.properties("referenced-data-file") == "f1")
    assert(Puffin.readDeletionVector(pf, 4, dvb.length.toLong).toSeq == Seq(1L, 5L, 9L))
    // unknown flag bits are refused typed, never guessed
    val pf2 = s"${tmpDir()}/badflag.puffin"
    writePuffin(pf2, flags = 2)
    val e3 = intercept[graft.core.GraftError.Plan](Puffin.readFooter(pf2))
    assert(e3.getMessage.contains("flags"))

    // whole-file round-trip: several DVs of different densities in ONE
    // puffin file — the footer's own coordinates drive each blob read
    val multi = s"${tmpDir()}/multi.puffin"
    val dvsIn = Seq(
      Puffin.Dv("fA", Seq(3L, 3L, 7L, (1L << 33) + 1)),
      Puffin.Dv("fB", (0L until 5000L).map(_ * 3)), // bitset container
      Puffin.Dv("fC", Seq(0L)))
    val refs = Puffin.writeDeletionVectors(multi, dvsIn, snapshotId = 9L, sequenceNumber = 4L)
    val ftr2 = Puffin.readFooter(multi)
    assert(ftr2.blobs.map(_.snapshotId).distinct == Seq(9L))
    assert(ftr2.blobs.map(_.sequenceNumber).distinct == Seq(4L))
    dvsIn.zip(refs).foreach { case (dv, r) =>
      val viaFooter = ftr2.blobs.find(
        _.properties("referenced-data-file") == dv.referencedDataFile).get
      assert(viaFooter.offset == r.offset && viaFooter.length == r.length)
      assert(Puffin.readDeletionVector(multi, r.offset, r.length).toSeq ==
        dv.positions.distinct.sorted)
      assert(r.cardinality == dv.positions.distinct.length.toLong)
    }
  }

  test("v3 deletion vectors: puffin DVs read through merge-on-read, sequence-gated, superseding position files") {
    import org.apache.spark.sql.functions.{col, expr}
    import spark.implicits._
    import graft.sources.Puffin
    val dir = s"${tmpDir()}/tbl"
    IcebergSource.commitAppend(spark, dir, nums(0, 100), 1L, 1L)

    // snapshot 2 (DELETE): a deletion vector over id % 9 == 0, with
    // coordinates from the parquet scan's own _metadata
    val paths = IcebergSource.dataFiles(dir).map(_.path)
    val dvDf = spark.read.parquet(paths: _*)
      .select(col("id"),
        expr("_metadata.file_path").as("file_path"),
        expr("_metadata.row_index").as("pos"))
      .filter(col("id") % 9 === 0)
      .select("file_path", "pos")
    IcebergSource.commitDeletes(spark, dir, dvDeletes = Some(dvDf),
      snapshotId = 2L, timestampMs = 2L)

    // the written puffin file is spec-shaped: footer parses, blobs are
    // deletion-vector-v1 with referenced-data-file + cardinality props
    val puffinPath = s"$dir/data/snap-2-deletes.puffin"
    val footer = Puffin.readFooter(puffinPath)
    assert(footer.blobs.nonEmpty)
    assert(footer.blobs.forall(_.blobType == "deletion-vector-v1"))
    assert(footer.blobs.forall(b =>
      b.properties.contains("referenced-data-file") &&
        b.properties.get("cardinality").exists(_.toLong > 0)))

    val afterDv = IcebergSource.read(spark, dir)
    val expect1 = (0 until 100).filter(_ % 9 != 0).map(_.toLong).toSet
    assert(afterDv.select("id").as[Long].collect().toSet == expect1)

    // snapshot 3 re-adds id 0 and appends 100..109: sequence 3 is
    // above the DV's (2), so the DV cannot touch the new rows — the
    // same v2 gate (delSeq >= dataSeq) applied to DVs
    IcebergSource.commitAppend(spark, dir,
      nums(0, 1).unionByName(nums(100, 110)), 3L, 3L)
    val afterReadd = IcebergSource.read(spark, dir)
    assert(afterReadd.select("id").as[Long].collect().toSet ==
      expect1 ++ Set(0L) ++ (100L until 110L))
    assert(afterReadd.filter(col("id") === 0).count() == 1)

    // time travel BEFORE the DV snapshot sees all rows
    assert(IcebergSource.read(spark, dir, Some(1L)).count() == 100)

    // the DV commit raised the table to format-version 3, and the
    // later append did NOT downgrade it (a spec-conformant foreign
    // reader would reject DV entries under v2)
    assert(IcebergSource.readMeta(dir).formatVersion == 3L)

    // an unknown future format version is refused typed, not misread
    val vCur = IcebergSource.currentVersion(dir)
    val mp = java.nio.file.Paths.get(dir, "metadata", s"v$vCur.metadata.json")
    val doctored = new String(java.nio.file.Files.readAllBytes(mp), "UTF-8")
      .replace("\"format-version\":3", "\"format-version\":4")
    val v4 = java.nio.file.Paths.get(dir, "metadata", s"v${vCur + 1}.metadata.json")
    java.nio.file.Files.write(v4, doctored.getBytes("UTF-8"))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "metadata", "version-hint.text"),
      (vCur + 1).toString.getBytes("UTF-8"))
    val ev = intercept[graft.core.GraftError.Plan](IcebergSource.readMeta(dir))
    assert(ev.getMessage.contains("format-version 4"))
    // restore the hint for the rest of the scenario
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "metadata", "version-hint.text"),
      vCur.toString.getBytes("UTF-8"))

    // plan shape: DV application is a broadcast anti-join too
    val plan = afterDv.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"DV deletes should broadcast-anti-join:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian in DV plan:\n$plan")

    // SUPERSEDE + MERGE law (v3 spec): once a data file is covered by
    // a DV, readers IGNORE position delete FILES for it — so the DV
    // WRITER must fold every existing position delete for that file
    // into the new blob. Fresh table: a parquet position delete of
    // id 0 (snap 2), then a DV of id 1 only (snap 3): the committed
    // blob must carry BOTH, or id 0 would silently resurrect.
    val dir2 = s"${tmpDir()}/tbl2"
    IcebergSource.commitAppend(spark, dir2, nums(0, 10), 1L, 1L)
    val p2 = IcebergSource.dataFiles(dir2).map(_.path)
    def coords2(idPred: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
      spark.read.parquet(p2: _*)
        .select(col("id"), expr("_metadata.file_path").as("file_path"),
          expr("_metadata.row_index").as("pos"))
        .filter(idPred(col("id"))).select("file_path", "pos")
    IcebergSource.commitDeletes(spark, dir2,
      posDeletes = Some(coords2(_ === 0)), snapshotId = 2L, timestampMs = 2L)
    assert(IcebergSource.read(spark, dir2).select("id").as[Long].collect().toSet ==
      (1L until 10L).toSet)
    IcebergSource.commitDeletes(spark, dir2,
      dvDeletes = Some(coords2(_ === 1)), snapshotId = 3L, timestampMs = 3L)
    assert(IcebergSource.read(spark, dir2).select("id").as[Long].collect().toSet ==
      (2L until 10L).toSet,
      "DV commit must merge the parquet position-delete file it supersedes")
    // time travel before the DV still sees only the parquet delete
    assert(IcebergSource.read(spark, dir2, Some(2L)).select("id").as[Long]
      .collect().toSet == (1L until 10L).toSet)

    // DV-then-DV: the second commit folds the first blob in and
    // RETIRES the old entry — at most one live DV per data file
    IcebergSource.commitDeletes(spark, dir2,
      dvDeletes = Some(coords2(_ === 2)), snapshotId = 4L, timestampMs = 4L)
    assert(IcebergSource.read(spark, dir2).select("id").as[Long].collect().toSet ==
      (3L until 10L).toSet)
    val (_, liveDels2) = IcebergSource.planFiles(dir2)
    val dvsPerFile = liveDels2.filter(_.isDv).groupBy(_.referencedFile.get
      .replaceFirst("^file:/+", "/")).view.mapValues(_.size).toMap
    assert(dvsPerFile.values.forall(_ == 1),
      s"at most one live DV per data file, got $dvsPerFile")
    // ...and the merged blob's cardinality covers all three deletes
    val totalDvCard = liveDels2.filter(_.isDv).map(d =>
      Puffin.readDeletionVector(d.path, d.contentOffset.get, d.contentSize.get).size).sum
    assert(totalDvCard == 3, s"merged DV should hold 3 positions, got $totalDvCard")
    // time travel to snapshot 3 still sees exactly snap-3's merge state
    assert(IcebergSource.read(spark, dir2, Some(3L)).select("id").as[Long]
      .collect().toSet == (2L until 10L).toSet)
  }

  test("inheritance-style manifests: null entry snapshot_id falls back to the manifest's adding snapshot in the append-diff") {
    import spark.implicits._
    import org.apache.avro.file.{DataFileReader, DataFileWriter}
    import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
    import scala.jdk.CollectionConverters._
    val dir = s"${tmpDir()}/tbl"
    IcebergSource.commitAppend(spark, dir, nums(0, 10), 1L, 1L)
    IcebergSource.commitAppend(spark, dir, nums(10, 20), 2L, 2L)
    // rewrite snapshot 2's manifest with entry snapshot_id = null —
    // the v2 inheritance shape (the adding snapshot comes from the
    // manifest list's added_snapshot_id)
    val m2 = new java.io.File(s"$dir/metadata/manifest-2.avro")
    val rd = new DataFileReader[GenericRecord](m2, new GenericDatumReader[GenericRecord]())
    val (schema, recs) =
      try (rd.getSchema, rd.iterator().asScala.toVector) finally rd.close()
    recs.foreach(_.put("snapshot_id", null))
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, m2)
    try recs.foreach(w.append) finally w.close()
    // the append-diff still sees snapshot 2's files (a Some-only
    // pattern silently dropped them), and the full read is unchanged
    val win = IcebergSource.addedFiles(dir, Some(1L), 2L)
    assert(win.nonEmpty, "inheritance-style entries must not vanish from the diff")
    assert(IcebergSource.readIncremental(spark, dir, Some(1L), 2L)
      .select("id").as[Long].collect().toSet == (10L until 20L).toSet)
    assert(IcebergSource.read(spark, dir).count() == 20)
  }

  test("deletion vectors compose with net-changes incremental windows") {
    import org.apache.spark.sql.functions.{col, expr}
    import spark.implicits._
    val dir = s"${tmpDir()}/tbl"
    // snap 1 (pre-window): 0..9; snap 2: adds 10..29; snap 3: DV
    // deleting the even ids of ALL files so far; snap 4: adds 30..39
    IcebergSource.commitAppend(spark, dir, nums(0, 10), 1L, 1L)
    IcebergSource.commitAppend(spark, dir, nums(10, 30), 2L, 2L)
    val paths = IcebergSource.dataFiles(dir).map(_.path)
    val dvDf = spark.read.parquet(paths: _*)
      .select(col("id"), expr("_metadata.file_path").as("file_path"),
        expr("_metadata.row_index").as("pos"))
      .filter(col("id") % 2 === 0).select("file_path", "pos")
    IcebergSource.commitDeletes(spark, dir, dvDeletes = Some(dvDf),
      snapshotId = 3L, timestampMs = 3L)
    IcebergSource.commitAppend(spark, dir, nums(30, 40), 4L, 4L)
    // (1, 4] net-changes: snap 2's rows minus the DV (snap 4 outranks
    // it; snap 1's rows are pre-window and never appear)
    val win = IcebergSource.readIncremental(spark, dir, Some(1L), 4L)
      .select("id").as[Long].collect().toSet
    assert(win == (10L until 30L).filter(_ % 2 != 0).toSet ++ (30L until 40L), win.toString)
    // full MoR scan agrees with the bootstrap window
    val full = IcebergSource.read(spark, dir).select("id").as[Long].collect().toSet
    assert(IcebergSource.readIncremental(spark, dir, None, 4L)
      .select("id").as[Long].collect().toSet == full)
  }

  test("compaction: deletes fold into rewrites, carried files keep explicit sequence numbers, expiry leaves reads exact") {
    import org.apache.spark.sql.functions.{col, expr}
    import spark.implicits._
    val dir = s"${tmpDir()}/tbl"
    // snap 1: ids 0..99; snap 2: pos-delete id%7==0 + eq-delete row1/row2
    IcebergSource.commitAppend(spark, dir, nums(0, 100), 1L, 1L)
    val paths = IcebergSource.dataFiles(dir).map(_.path)
    val posDf = spark.read.parquet(paths: _*)
      .select(col("id"), expr("_metadata.file_path").as("file_path"),
        expr("_metadata.row_index").as("pos"))
      .filter(col("id") % 7 === 0).select("file_path", "pos")
    IcebergSource.commitDeletes(spark, dir,
      posDeletes = Some(posDf),
      eqDeletes = Some((Seq("row1", "row2").toDF("tag"), Seq("tag"))),
      snapshotId = 2L, timestampMs = 2L)
    // snap 3: 100..119 — sequence 3 outranks the deletes, so these
    // files are NOT delete-affected and must be carried forward
    IcebergSource.commitAppend(spark, dir, nums(100, 120), 3L, 3L)
    val before = IcebergSource.read(spark, dir).select("id").as[Long].collect().toSet

    // snap 4 (REPLACE): smallFileBytes=0 pins the rewrite set to
    // exactly the delete-affected files
    IcebergSource.compact(spark, dir, 4L, 4L, smallFileBytes = 0L)
    val after = IcebergSource.read(spark, dir)
    assert(after.select("id").as[Long].collect().toSet == before,
      "compaction must not change the table's rows")

    // plan shape after compaction: no delete files left; snap-3 files
    // carried with their ORIGINAL sequence number (explicit entry
    // field), rewrites at the compaction's sequence
    val (files4, dels4) = IcebergSource.planFiles(dir)
    assert(dels4.isEmpty, "compaction must fold every delete file away")
    assert(files4.exists(_.seq == 3L), "carried files keep sequence 3")
    assert(files4.exists(_.seq == 4L), "rewritten files inherit sequence 4")
    assert(!files4.exists(f => f.seq != 3L && f.seq != 4L), files4.map(_.seq).toString)

    // a delete committed AFTER compaction gates correctly against both
    // carried (seq 3) and rewritten (seq 4) files
    IcebergSource.commitDeletes(spark, dir,
      eqDeletes = Some((Seq("row50", "row110").toDF("tag"), Seq("tag"))),
      snapshotId = 5L, timestampMs = 5L)
    val expect5 = before - 50L - 110L
    assert(IcebergSource.read(spark, dir).select("id").as[Long].collect().toSet == expect5)

    // EXPIRE snapshots 1..3: the carried EXISTING entries' sequence
    // numbers must now resolve from the explicit entry-level field
    // alone (their adding snapshots are gone from metadata) — the
    // silent-zero default would re-apply the post-compaction delete
    // to everything; the typed refusal would kill the read. Neither:
    // the read stays exact.
    IcebergSource.expireSnapshots(dir, keep = Set(4L, 5L), timestampMs = 6L)
    assert(IcebergSource.read(spark, dir).select("id").as[Long].collect().toSet == expect5,
      "reads after expiry resolve carried sequence numbers from the entry field")
    // time travel to an expired snapshot fails, not guesses
    intercept[IllegalArgumentException](IcebergSource.read(spark, dir, Some(1L)))

    // incremental windows refuse to cross the compaction snapshot
    val dir2 = s"${tmpDir()}/tbl2"
    IcebergSource.commitAppend(spark, dir2, nums(0, 10), 1L, 1L)
    IcebergSource.commitAppend(spark, dir2, nums(10, 20), 2L, 2L)
    IcebergSource.compact(spark, dir2, 3L, 3L) // merges small files
    IcebergSource.commitAppend(spark, dir2, nums(20, 30), 4L, 4L)
    val e = intercept[graft.core.GraftError.Plan](
      IcebergSource.readIncremental(spark, dir2, Some(1L), 4L))
    assert(e.getMessage.contains("replace"))
    // a window entirely after the compaction still reads
    assert(IcebergSource.readIncremental(spark, dir2, Some(3L), 4L)
      .select("id").as[Long].collect().toSet == (20L until 30L).toSet)
    // and the compacted table itself reads exactly
    assert(IcebergSource.read(spark, dir2).count() == 30)
  }

  test("partitioned compaction: partition structs and pruning survive the rewrite") {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.{sources => sqs}
    import spark.implicits._
    val dir = s"${tmpDir()}/tbl"
    val df = (0 until 60).map(i => (i.toLong, s"g${i % 3}", i * 1.0)).toDF("id", "g", "v")
    IcebergSource.commitAppend(spark, dir, df.filter(col("id") < 30), 1L, 1L,
      partitionBy = Seq("g"))
    IcebergSource.commitAppend(spark, dir, df.filter(col("id") >= 30), 2L, 2L)
    val paths = IcebergSource.dataFiles(dir).map(_.path)
    val posDf = spark.read.parquet(paths: _*)
      .select(col("id"), expr("_metadata.file_path").as("file_path"),
        expr("_metadata.row_index").as("pos"))
      .filter(col("id") % 5 === 0).select("file_path", "pos")
    IcebergSource.commitDeletes(spark, dir, posDeletes = Some(posDf),
      snapshotId = 3L, timestampMs = 3L)
    val before = IcebergSource.read(spark, dir).select("id").as[Long].collect().toSet
    assert(before == (0L until 60L).filterNot(_ % 5 == 0).toSet)

    IcebergSource.compact(spark, dir, 4L, 4L) // everything is small → full rewrite
    val after = IcebergSource.read(spark, dir)
    assert(after.select("id").as[Long].collect().toSet == before)

    // every rewritten entry carries its partition struct, the delete
    // files are gone, and manifest pruning still prunes
    val (files4, dels4) = IcebergSource.planFiles(dir)
    assert(dels4.isEmpty)
    assert(files4.forall(_.partition.contains("g")), files4.map(_.partition).toString)
    val pruned = IcebergSource.dataFiles(dir,
      filters = Seq(sqs.EqualTo("g", "g1"): sqs.Filter))
    assert(pruned.nonEmpty && pruned.size < files4.size,
      s"pruning must survive compaction: ${pruned.size} vs ${files4.size}")
    assert(IcebergSource.read(spark, dir,
        filters = Seq(sqs.EqualTo("g", "g1"): sqs.Filter))
      .filter(col("g") === "g1")
      .select("id").as[Long].collect().toSet ==
      (0L until 60L).filter(i => i % 3 == 1 && i % 5 != 0).toSet)
  }

  test("non-identity transforms: spec bucket function matches the published vectors; monotone pruning is conservative and correct") {
    import IcebergSource.{PartField, bucketOf, transformLit, fileMayMatch}
    import org.apache.spark.sql.{sources => sqs}

    // Appendix B test vectors (iceberg.apache.org/spec): the bucket
    // hash of int 34 and long 34 is 2017239379; string "iceberg" is
    // 1210000089; date 2017-11-16 (epoch day 17486) is -653330422.
    assert(IcebergSource.murmur3(java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(34L).array()) == 2017239379)
    assert(bucketOf(34, 16) == Some((2017239379 & Int.MaxValue) % 16))
    assert(bucketOf(34L, 16) == bucketOf(34, 16), "int and long must hash identically")
    assert(IcebergSource.murmur3("iceberg".getBytes("UTF-8")) == 1210000089)
    assert(IcebergSource.murmur3(java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(17486L).array()) == -653330422)

    // truncate: floor semantics for negatives, code points for strings
    assert(transformLit("truncate[10]", Int.box(-1)) == Some(Int.box(-10)))
    assert(transformLit("truncate[10]", Long.box(25L)) == Some(Long.box(20L)))
    assert(transformLit("truncate[3]", "banana") == Some("ban"))
    assert(transformLit("truncate[9]", "ab") == Some("ab"))
    // temporal ordinals relative to 1970 (UTC)
    val d = java.sql.Date.valueOf("2017-11-16")
    assert(transformLit("year", d) == Some(Int.box(47)))
    assert(transformLit("month", d) == Some(Int.box(47 * 12 + 10)))
    assert(transformLit("day", d) == Some(Long.box(17486L)))
    val ts = java.sql.Timestamp.from(java.time.Instant.parse("2017-11-16T14:31:08Z"))
    assert(transformLit("hour", ts) == Some(Long.box(17486L * 24 + 14)))

    // pruning under a bucket spec: equality prunes wrong buckets, keeps
    // the right one; ranges never prune (bucket is not order-preserving)
    val bSpec = Seq(PartField("id_bucket", "id", "bucket[16]"))
    val b34 = bucketOf(34L, 16).get
    assert(fileMayMatch(sqs.EqualTo("id", 34L), Map("id_bucket" -> b34), bSpec))
    assert(!fileMayMatch(sqs.EqualTo("id", 34L), Map("id_bucket" -> ((b34 + 1) % 16)), bSpec))
    assert(fileMayMatch(sqs.GreaterThan("id", 34L), Map("id_bucket" -> b34), bSpec))
    assert(fileMayMatch(sqs.In("id", Array(34L, 35L)),
      Map("id_bucket" -> bucketOf(35L, 16).get), bSpec))

    // pruning under a day spec: the interval rule — equal ordinal may
    // straddle the literal (kept), strictly-lower ordinal is excluded
    // for >, strictly-higher for <
    val dSpec = Seq(PartField("ts_day", "ts", "day"))
    assert(fileMayMatch(sqs.GreaterThan("ts", ts), Map("ts_day" -> Long.box(17486L)), dSpec))
    assert(!fileMayMatch(sqs.GreaterThan("ts", ts), Map("ts_day" -> Long.box(17485L)), dSpec))
    assert(!fileMayMatch(sqs.LessThan("ts", ts), Map("ts_day" -> Long.box(17487L)), dSpec))
    assert(fileMayMatch(sqs.EqualTo("ts", ts), Map("ts_day" -> Long.box(17486L)), dSpec))
    assert(!fileMayMatch(sqs.EqualTo("ts", ts), Map("ts_day" -> Long.box(17485L)), dSpec))
    // null tests work through any non-void transform; void never prunes
    assert(!fileMayMatch(sqs.IsNull("ts"), Map("ts_day" -> Long.box(17486L)), dSpec))
    assert(!fileMayMatch(sqs.IsNotNull("ts"), Map("ts_day" -> null), dSpec))
    val vSpec = Seq(PartField("v_void", "ts", "void"))
    assert(fileMayMatch(sqs.IsNull("ts"), Map("v_void" -> null), vSpec))
    assert(fileMayMatch(sqs.EqualTo("ts", ts), Map("v_void" -> null), vSpec))
    // unknown transforms read everything
    val uSpec = Seq(PartField("x_zorder", "id", "zorder[4]"))
    assert(fileMayMatch(sqs.EqualTo("id", 1L), Map("x_zorder" -> Long.box(9L)), uSpec))

    // an UNKNOWN transform may be void-like (non-null source → null
    // partition value), so a null pv proves nothing: no null-based
    // exclusion, no IsNull/IsNotNull answers
    assert(fileMayMatch(sqs.EqualTo("id", 1L), Map("x_zorder" -> null), uSpec))
    assert(fileMayMatch(sqs.IsNotNull("id"), Map("x_zorder" -> null), uSpec))
    assert(fileMayMatch(sqs.IsNull("id"), Map("x_zorder" -> Long.box(9L)), uSpec))
    // ...while known null-preserving transforms still exclude soundly
    val iSpec = Seq(PartField("id", "id", "identity"))
    assert(!fileMayMatch(sqs.EqualTo("id", 1L), Map("id" -> null), iSpec))
    assert(!fileMayMatch(sqs.IsNotNull("id"), Map("id" -> null), iSpec))

    // comparator soundness: longs beyond 2^53 must not collide through
    // a double roundtrip — 2^53 and 2^53+1 round to the SAME double, so
    // a double-based Not(EqualTo) would wrongly prune the file
    val big = 9007199254740992L // 2^53
    assert(fileMayMatch(sqs.Not(sqs.EqualTo("id", big + 1)), Map("id" -> Long.box(big)), iSpec),
      "distinct longs that round to the same double must not prune")
    assert(!fileMayMatch(sqs.Not(sqs.EqualTo("id", big)), Map("id" -> Long.box(big)), iSpec))
    // strings compare by CODE POINT (Spark's UTF-8 binary order):
    // U+FFFF sorts BELOW a supplementary character (U+10000), while
    // UTF-16 String.compareTo says the opposite — a range prune based
    // on compareTo would wrongly exclude this file
    val supp = new String(Character.toChars(0x10000))
    assert("\uFFFF".compareTo(supp) > 0, "UTF-16 order (the trap) inverts here")
    assert(fileMayMatch(sqs.GreaterThan("s", "\uFFFF"), Map("s" -> supp),
      Seq(PartField("s", "s", "identity"))),
      "supplementary char is > U+FFFF in code-point order; must be kept")
  }

  test("truncate-transform table end-to-end: spec relabel prunes file plans and reads stay exact") {
    import org.apache.spark.sql.{sources => sqs}
    import spark.implicits._
    // Build an identity-partitioned table, then relabel the spec as
    // truncate[25] on the same source: every region name is shorter
    // than 25, so T(v) = v and the manifests' recorded values remain
    // exactly what a truncate[25] writer would have produced — a
    // consistent non-identity fixture without a non-identity writer.
    val dir = s"${tmpDir()}/tbl"
    val df = (0 until 60).map(i => (i.toLong, Seq("us", "eu", "ap")(i % 3), i * 1.5))
      .toDF("id", "region", "v")
    IcebergSource.commitAppend(spark, dir, df, 1L, 1L, partitionBy = Seq("region"))
    val metaPath = java.nio.file.Paths.get(s"$dir/metadata/v1.metadata.json")
    val metaJson = new String(java.nio.file.Files.readAllBytes(metaPath), "UTF-8")
    java.nio.file.Files.write(metaPath,
      metaJson.replace("\"identity\"", "\"truncate[25]\"").getBytes("UTF-8"))
    val meta = IcebergSource.readMeta(dir)
    assert(meta.spec.map(_.transform) == Seq("truncate[25]"))
    assert(meta.partitionFields.isEmpty, "truncate is not writable-identity")

    val all = IcebergSource.dataFiles(dir)
    val pruned = IcebergSource.dataFiles(dir, filters = Seq(sqs.EqualTo("region", "eu")))
    assert(pruned.nonEmpty && pruned.size < all.size)
    assert(pruned.forall(_.partition("region") == "eu"))
    // range prunes via the interval rule (string order on prefixes);
    // the transform rule alone must keep eu (T(v)=v may straddle) —
    // pinned directly so column-bounds pruning can't mask a regression
    val gtTransform = all.filter(f => IcebergSource.fileMayMatch(
      sqs.GreaterThan("region", "eu"), f.partition, meta.spec))
    assert(gtTransform.map(_.partition("region")).toSet == Set("eu", "us"),
      "eu may straddle (kept), ap provably below (pruned)")
    // the full planner ALSO applies column bounds, which prove the eu
    // file's every row equals 'eu' — so it prunes further, soundly
    val gt = IcebergSource.dataFiles(dir, filters = Seq(sqs.GreaterThan("region", "eu")))
    assert(gt.map(_.partition("region")).toSet == Set("us"),
      "column bounds prove eu has no row > 'eu'")
    // and the read of the pruned plan is exact after the engine filter
    val got = IcebergSource.read(spark, dir, filters = Seq(sqs.EqualTo("region", "eu")))
      .filter($"region" === "eu")
    assert(got.count() == 20)
  }

  test("non-ancestor incremental window is rejected, not silently wrong") {
    val dir = s"${tmpDir()}/tbl"
    IcebergSource.commitAppend(spark, dir, nums(0, 10), 5L, 1L)
    IcebergSource.commitAppend(spark, dir, nums(10, 20), 6L, 2L)
    intercept[IllegalArgumentException] {
      IcebergSource.addedFiles(dir, Some(999L), 6L)
    }
  }

  test("crash-safe commit protocol: old version stays readable until hint flips") {
    val dir = s"${tmpDir()}/tbl"
    IcebergSource.commitAppend(spark, dir, nums(0, 10), 1L, 1L)
    // a reader pinned to v1 metadata sees snapshot 1 regardless of later commits
    IcebergSource.commitAppend(spark, dir, nums(10, 30), 2L, 2L)
    val v1 = IcebergSource.readMeta(dir, version = 1)
    assert(v1.currentSnapshotId.contains(1L) && v1.snapshots.map(_.id) == Seq(1L))
    val v2 = IcebergSource.readMeta(dir, version = 2)
    assert(v2.snapshots.map(_.id) == Seq(1L, 2L))
  }

  test("manifest column bounds: footer stats prune an UNpartitioned table; " +
      "missing bounds and nulls stay conservative") {
    import org.apache.spark.sql.{sources => sqs}
    import spark.implicits._
    val dir = s"${tmpDir()}/tbl"
    // 8 files with disjoint id ranges (range partitioner) — pruning on
    // a selective predicate must drop most of them
    val df = (0 until 800).map(i => (i.toLong, s"tag${i % 7}",
      if (i % 5 == 0) null else s"s$i",
      java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays((i / 100).toLong))))
      .toDF("id", "tag", "maybe", "d")
      .repartitionByRange(8, col("id"))
    IcebergSource.commitAppend(spark, dir, df, 1L, 1L)

    val all = IcebergSource.dataFiles(dir)
    assert(all.size == 8)
    // bounds were written for every supported column
    assert(all.forall(f => f.lowerBounds.nonEmpty && f.upperBounds.nonEmpty))
    assert(all.forall(_.nullCounts.nonEmpty))

    // long range: id < 100 plans exactly the files whose range overlaps
    val lt = IcebergSource.dataFiles(dir, filters = Seq(sqs.LessThan("id", 100L)))
    assert(lt.nonEmpty && lt.size < all.size, s"expected pruning, got ${lt.size}/${all.size}")
    assert(IcebergSource.read(spark, dir, filters = Seq(sqs.LessThan("id", 100L)))
      .filter($"id" < 100L).count() == 100)
    // equality on one id hits exactly one file
    assert(IcebergSource.dataFiles(dir, filters = Seq(sqs.EqualTo("id", 7L))).size == 1)
    // In prunes to the union of matching files
    val inF = IcebergSource.dataFiles(dir,
      filters = Seq(sqs.In("id", Array(7L, 777L))))
    assert(inF.size == 2)
    // date bounds prune too (epoch-day comparison on both sides)
    val dLt = IcebergSource.dataFiles(dir, filters = Seq(
      sqs.LessThan("d", java.sql.Date.valueOf("2024-01-02"))))
    assert(dLt.nonEmpty && dLt.size < all.size, "date bounds must prune")
    // IsNull keeps files (every file has some nulls in `maybe`); a
    // column with zero nulls prunes IsNull everywhere
    assert(IcebergSource.dataFiles(dir, filters = Seq(sqs.IsNull("maybe"))).size == 8)
    assert(IcebergSource.dataFiles(dir, filters = Seq(sqs.IsNull("id"))).isEmpty,
      "null-count 0 proves IsNull matches no row")
    assert(IcebergSource.dataFiles(dir, filters = Seq(sqs.IsNotNull("maybe"))).size == 8)
    // double column: bounds deliberately absent (NaN soundness) → keep
    val dbl = (0 until 100).map(i => (i.toLong, i * 1.5)).toDF("id", "v")
      .repartitionByRange(4, col("id"))
    val dir2 = s"${tmpDir()}/tbl2"
    IcebergSource.commitAppend(spark, dir2, dbl, 1L, 1L)
    assert(IcebergSource.dataFiles(dir2,
      filters = Seq(sqs.GreaterThan("v", 1e9))).size == 4,
      "no float/double bounds → conservative keep")
    // predicates survive the full read path with deletes absent
    val eqRead = IcebergSource.read(spark, dir, filters = Seq(sqs.EqualTo("id", 7L)))
      .filter($"id" === 7L)
    assert(eqRead.count() == 1)
  }

  test("bound serde + string truncation: Appendix-D round-trip, truncated " +
      "bounds stay sound, unknown types decode to no bound") {
    import IcebergSource.{serializeBound, deserializeBound, truncLower, truncUpper}
    for ((t, v) <- Seq[(String, Any)]("int" -> 42, "long" -> 42L,
        "boolean" -> true, "date" -> java.time.LocalDate.of(2024, 3, 1),
        "string" -> "héllo")) {
      val b = serializeBound(t, v).get
      assert(deserializeBound(t, b).contains(v), s"round-trip $t")
    }
    // spec widths: int/date 4 LE, long 8 LE
    assert(serializeBound("int", 1).get.toSeq == Seq[Byte](1, 0, 0, 0))
    assert(serializeBound("long", 1L).get.length == 8)
    // mismatched runtime type or unknown type name → no bound
    assert(serializeBound("long", 1).isEmpty)
    assert(serializeBound("timestamptz", 1L).isEmpty)
    assert(deserializeBound("int", Array[Byte](1, 2)).isEmpty)
    assert(deserializeBound("uuid", Array[Byte](1)).isEmpty)
    // truncation: lower is a prefix (≤ every extension), upper
    // increments (≥ every extension); short strings pass untouched
    val s = "abcdefghijklmnopqrst" // 20 cps
    assert(truncLower(s) == "abcdefghijklmnop")
    assert(truncUpper(s).contains("abcdefghijklmnoq"))
    assert(truncLower("short") == "short" && truncUpper("short").contains("short"))
    assert(truncLower(s) <= s && truncUpper(s).get > s)
    // a max-code-point tail walks left; an all-max string yields None
    val allMax = new String(Array.fill(17)(Character.MAX_CODE_POINT), 0, 17)
    assert(truncUpper(allMax).isEmpty)
  }

  test("decimal bounds: footer-harvested DECIMAL stats prune signed ranges; " +
      "absent bounds and nested columns stay conservative; coverage recorded") {
    import org.apache.spark.sql.{sources => sqs}
    import spark.implicits._
    // Appendix-D serde round-trip incl. negatives (two's-complement
    // big-endian unscaled bytes) and the minimal-width encoding
    for (v <- Seq("0.00", "12345.67", "-12345.67", "-0.01")) {
      val d = new java.math.BigDecimal(v)
      val b = IcebergSource.serializeBound("decimal(12, 2)", d).get
      assert(IcebergSource.deserializeBound("decimal(12, 2)", b).contains(d), s"round-trip $v")
    }
    assert(IcebergSource.serializeBound("decimal(12, 2)",
      new java.math.BigDecimal("0.01")).get.length == 1, "minimal bytes")
    // a bound at coarser scale re-scales to the type's before encoding
    assert(IcebergSource.serializeBound("decimal(12, 2)", new java.math.BigDecimal("5"))
      .flatMap(IcebergSource.deserializeBound("decimal(12, 2)", _))
      .contains(new java.math.BigDecimal("5.00")))

    // decimal column spanning negatives, range-clustered into 8 files:
    // signed ordering must prune BOTH tails correctly
    val dir = s"${tmpDir()}/tbl"
    val df = spark.range(0L, 800L).select(col("id"),
      (col("id") - 400).cast("decimal(12,2)").as("amt"))
      .repartitionByRange(8, col("amt"))
    IcebergSource.commitAppend(spark, dir, df, 1L, 1L)
    val all = IcebergSource.dataFiles(dir)
    assert(all.size == 8)
    val lo = IcebergSource.dataFiles(dir,
      filters = Seq(sqs.LessThan("amt", new java.math.BigDecimal("-300.00"))))
    assert(lo.nonEmpty && lo.size < all.size, s"low tail must prune: ${lo.size}/${all.size}")
    val hi = IcebergSource.dataFiles(dir,
      filters = Seq(sqs.GreaterThan("amt", new java.math.BigDecimal("300.00"))))
    assert(hi.nonEmpty && hi.size < all.size, s"high tail must prune: ${hi.size}/${all.size}")
    // unsigned byte order would misplace negatives entirely; prove the
    // pruned read is still exact on the negative tail
    assert(IcebergSource.read(spark, dir,
        filters = Seq(sqs.LessThan("amt", new java.math.BigDecimal("-300.00"))))
      .filter($"amt" < -300).count() == 100)
    // equality inside one file's range plans few files, and never zero
    val eq = IcebergSource.dataFiles(dir,
      filters = Seq(sqs.EqualTo("amt", new java.math.BigDecimal("0.00"))))
    assert(eq.nonEmpty && eq.size < all.size)

    // conservative-on-missing: the same predicates against refs with
    // bounds stripped must keep every file
    val meta = IcebergSource.readMeta(dir)
    val stripped = all.map(_.copy(lowerBounds = Map.empty, upperBounds = Map.empty,
      nullCounts = Map.empty))
    assert(stripped.forall(r => IcebergSource.statsMayMatch(
      sqs.LessThan("amt", new java.math.BigDecimal("-1000000.00")), r, meta)),
      "absent bounds must retain (never prune)")
    // a NESTED column predicate has no top-level field id → retained
    assert(all.forall(r => IcebergSource.statsMayMatch(
      sqs.EqualTo("s.inner", 1), r, meta)),
      "nested-column predicates must stay conservative")

    // recorded fidelity: the commit notes which columns carry bounds
    val v = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      dir, "metadata", s"v${IcebergSource.currentVersion(dir)}.metadata.json")),
      java.nio.charset.StandardCharsets.UTF_8)
    assert(v.contains("graft.bounds-coverage"), "coverage note missing")
    assert(v.contains("amt:bounded") && v.contains("id:bounded"), s"coverage wrong")
    // a struct column is depth>1 in the footer → recorded unbounded,
    // and predicates on it never prune (asserted above via s.inner)
    val dir2 = s"${tmpDir()}/tbl2"
    val nested = spark.range(0L, 100L).select(col("id"),
      struct(col("id").as("inner")).as("s"))
    IcebergSource.commitAppend(spark, dir2, nested, 1L, 1L)
    val v2 = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      dir2, "metadata", s"v${IcebergSource.currentVersion(dir2)}.metadata.json")),
      java.nio.charset.StandardCharsets.UTF_8)
    assert(v2.contains("s:unbounded"), "nested column must be recorded unbounded")
    assert(v2.contains("id:bounded"))
  }

  test("__HIVE_DEFAULT_PARTITION__ is NO-INFO for string partitions: empty-string " +
      "rows survive pruning; non-string null partitions still prune exactly") {
    import org.apache.spark.sql.{sources => sqs}
    import spark.implicits._
    // Spark's path layout writes BOTH null and "" as the default token,
    // so a string token must never be read back as a provable null
    val dir = s"${tmpDir()}/tbl"
    val df = Seq((1L, "a"), (2L, ""), (3L, null.asInstanceOf[String]), (4L, "b"))
      .toDF("id", "region")
    IcebergSource.commitAppend(spark, dir, df, 1L, 1L, partitionBy = Seq("region"))
    val all = IcebergSource.dataFiles(dir)
    // the (null|"")-token file is RETAINED for an empty-string equality —
    // recording null here once pruned it (silent row loss)
    val eqEmpty = IcebergSource.dataFiles(dir, filters = Seq(sqs.EqualTo("region", "")))
    assert(eqEmpty.exists(_.path.contains("__HIVE_DEFAULT_PARTITION__")),
      "token file must survive EqualTo(region, \"\")")
    val r = IcebergSource.read(spark, dir, filters = Seq(sqs.EqualTo("region", "")))
      .filter($"region" === "")
    assert(r.select("id").as[Long].collect().toSeq == Seq(2L))
    // null reads stay exact through the same conservatism
    val rn = IcebergSource.read(spark, dir, filters = Seq(sqs.IsNull("region")))
      .filter($"region".isNull)
    assert(rn.select("id").as[Long].collect().toSeq == Seq(3L))
    // real values still prune ("b" file dropped; token file kept conservatively)
    val eqA = IcebergSource.dataFiles(dir, filters = Seq(sqs.EqualTo("region", "a")))
    assert(eqA.size < all.size, s"expected value pruning, got ${eqA.size}/${all.size}")
    // NON-string partitions have no null/""-collision: their token is
    // provably null and equality pruning stays exact
    val dir2 = s"${tmpDir()}/tbl2"
    val df2 = Seq((1L, java.lang.Long.valueOf(10L)), (2L, null.asInstanceOf[java.lang.Long]))
      .toDF("id", "k")
    IcebergSource.commitAppend(spark, dir2, df2, 1L, 1L, partitionBy = Seq("k"))
    val eqK = IcebergSource.dataFiles(dir2, filters = Seq(sqs.EqualTo("k", 10L)))
    assert(eqK.size == 1 && !eqK.head.path.contains("__HIVE_DEFAULT_PARTITION__"),
      "long null partition must still prune equality exactly")
  }

  test("legacy tables (no footer ids, no snapshot schema-ids) stay readable " +
      "after schema evolution via the oldest schema") {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val dir = s"${tmpDir()}/tbl"
    val df = Seq((1L, "x"), (2L, "y")).toDF("id", "name")
    IcebergSource.commitAppend(spark, dir, df, 1L, 1L)
    // simulate a PRE-EVOLUTION writer: strip parquet footer field ids
    // (plain re-write of each data file) and snapshot schema-ids
    IcebergSource.dataFiles(dir).map(_.path).foreach { p =>
      val rows = spark.read.parquet(p).collect().toSeq
      // strip the parquet.field.id column metadata, or the re-write
      // would re-embed the very footer ids the fixture must lack
      val schema = org.apache.spark.sql.types.StructType(
        spark.read.parquet(p).schema.map(_.copy(
          metadata = org.apache.spark.sql.types.Metadata.empty)))
      val tmp = p + ".plainw"
      spark.createDataFrame(rows.asJava, schema).coalesce(1).write.parquet(tmp)
      val part = java.nio.file.Files.walk(java.nio.file.Paths.get(tmp)).iterator().asScala
        .map(_.toString).filter(_.endsWith(".parquet")).toSeq.head
      java.nio.file.Files.delete(java.nio.file.Paths.get(p))
      java.nio.file.Files.move(java.nio.file.Paths.get(part), java.nio.file.Paths.get(p))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
      // drop the stale hadoop checksum sidecar of the replaced file
      val f = new java.io.File(p)
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(f.getParentFile, s".${f.getName}.crc"))
    }
    assert(graft.sources.ParquetFooters.fieldIdsOf(
      IcebergSource.dataFiles(dir).head.path).isEmpty, "fixture must lack footer ids")
    val metaPath = java.nio.file.Paths.get(dir, "metadata",
      s"v${IcebergSource.currentVersion(dir)}.metadata.json")
    val doctored = new String(java.nio.file.Files.readAllBytes(metaPath),
      java.nio.charset.StandardCharsets.UTF_8)
      .replaceAll(""","schema-id":\d+""", "").replaceAll(""""schema-id":\d+,""", "")
    java.nio.file.Files.write(metaPath, doctored.getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    assert(IcebergSource.readMeta(dir).snapshots.forall(_.schemaId.isEmpty),
      "fixture must lack snapshot schema-ids")
    // first evolution on the legacy table: rename a column
    IcebergSource.alterSchema(dir, timestampMs = 2L,
      renames = Map("name" -> "label"))
    // the legacy file resolves through the OLDEST schema (the only one
    // it can have been written under) — this read used to throw with a
    // suggested fix (compact) that threw identically
    val got = IcebergSource.read(spark, dir)
      .orderBy("id").select("id", "label").as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "x"), (2L, "y")))
    // and a post-evolution append composes: new file under the new
    // schema, legacy file still resolved by id
    IcebergSource.commitAppend(spark, dir,
      Seq((3L, "z")).toDF("id", "label"), 2L, 3L)
    val got2 = IcebergSource.read(spark, dir)
      .orderBy("id").select("id", "label").as[(Long, String)].collect().toSeq
    assert(got2 == Seq((1L, "x"), (2L, "y"), (3L, "z")))
  }

  test("timestamp bounds: INT64-micros footers prune instant and wall-clock " +
      "columns; INT96 layouts yield no bound and stay conservative") {
    import org.apache.spark.sql.{sources => sqs}
    // WALL-CLOCK (NTZ) column — Spark always lays NTZ out as INT64
    // micros (isAdjustedToUTC=false), so bounds exist with any conf
    val dir = s"${tmpDir()}/ntz"
    val hourlyNtz = spark.range(0L, 800L).select(col("id"),
      expr("CAST(timestamp_micros(id * 3600000000) AS TIMESTAMP_NTZ)").as("ts"))
      .repartitionByRange(8, col("ts"))
    IcebergSource.commitAppend(spark, dir, hourlyNtz, 1L, 1L)
    val all = IcebergSource.dataFiles(dir)
    val cut = java.time.LocalDateTime.ofEpochSecond(400L * 3600, 0, java.time.ZoneOffset.UTC)
    val lt = IcebergSource.dataFiles(dir, filters = Seq(sqs.LessThan("ts", cut)))
    assert(lt.nonEmpty && lt.size < all.size, s"NTZ bounds must prune: ${lt.size}/${all.size}")
    assert(IcebergSource.read(spark, dir, filters = Seq(sqs.LessThan("ts", cut)))
      .filter(col("ts") < lit(cut)).count() == 400)
    // INSTANT column under INT64-micros output: prunes against both
    // java.sql.Timestamp and java.time.Instant literals
    val prev = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try {
      val dir2 = s"${tmpDir()}/tz64"
      val hourlyTz = spark.range(0L, 800L).select(col("id"),
        expr("timestamp_micros(id * 3600000000)").as("ts"))
        .repartitionByRange(8, col("ts"))
      IcebergSource.commitAppend(spark, dir2, hourlyTz, 1L, 1L)
      val all2 = IcebergSource.dataFiles(dir2)
      val tsLit = new java.sql.Timestamp(400L * 3600 * 1000)
      val lt2 = IcebergSource.dataFiles(dir2, filters = Seq(sqs.LessThan("ts", tsLit)))
      assert(lt2.nonEmpty && lt2.size < all2.size, s"tz bounds must prune: ${lt2.size}/${all2.size}")
      val lt2i = IcebergSource.dataFiles(dir2, filters = Seq(
        sqs.LessThan("ts", java.time.Instant.ofEpochSecond(400L * 3600))))
      assert(lt2i.size == lt2.size, "Instant literal must prune like Timestamp")
      assert(IcebergSource.read(spark, dir2, filters = Seq(sqs.LessThan("ts", tsLit)))
        .filter(col("ts") < lit(tsLit)).count() == 400)
      // INT96 layout records no usable stats → no bounds → every file kept
      spark.conf.set("spark.sql.parquet.outputTimestampType", "INT96")
      val dir3 = s"${tmpDir()}/tz96"
      IcebergSource.commitAppend(spark, dir3, hourlyTz, 1L, 1L)
      val kept = IcebergSource.dataFiles(dir3, filters = Seq(sqs.LessThan("ts", tsLit)))
      assert(kept.size == IcebergSource.dataFiles(dir3).size,
        "INT96 must stay conservative (no bounds, no pruning)")
    } finally prev.fold(spark.conf.unset("spark.sql.parquet.outputTimestampType"))(
      spark.conf.set("spark.sql.parquet.outputTimestampType", _))
    // wall-clock bounds never compare against instant literals
    val crossed = IcebergSource.dataFiles(dir, filters = Seq(
      sqs.LessThan("ts", new java.sql.Timestamp(0L))))
    assert(crossed.size == all.size,
      "NTZ bound vs instant literal must be no-info, not a prune")
  }

  test("footer stats merge across row groups: decimal/timestamp/long bounds " +
      "equal the true file min/max on a multi-row-group file") {
    import scala.jdk.CollectionConverters._
    val dir = s"${tmpDir()}/mrg"
    // force many small row groups so the per-column accumulator's
    // cmpSame merge actually runs for every bound type
    val prev = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try {
      spark.range(0L, 200000L).select(
        col("id"),
        (col("id") - 100000L).cast("decimal(12,2)").as("amt"),
        expr("timestamp_micros(id * 1000000)").as("ts"),
        expr("CAST(timestamp_micros(id * 1000000) AS TIMESTAMP_NTZ)").as("tsn"))
        .coalesce(1)
        .write.option("parquet.block.size", 64 * 1024).parquet(dir)
      val file = java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).iterator()
        .asScala.map(_.toString).filter(_.endsWith(".parquet")).toSeq.head
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(file), new org.apache.hadoop.conf.Configuration()))
      val nGroups = try reader.getFooter.getBlocks.size finally reader.close()
      assert(nGroups > 1, s"fixture must span row groups, got $nGroups")
      val fs = graft.sources.ParquetFooters.read(file)
      assert(fs.rowCount == 200000L)
      assert(fs.cols("id").lower.contains(0L) && fs.cols("id").upper.contains(199999L))
      assert(fs.cols("amt").lower.contains(new java.math.BigDecimal("-100000.00")))
      assert(fs.cols("amt").upper.contains(new java.math.BigDecimal("99999.00")))
      assert(fs.cols("ts").lower.contains(java.time.Instant.ofEpochSecond(0L)))
      assert(fs.cols("ts").upper.contains(java.time.Instant.ofEpochSecond(199999L)))
      assert(fs.cols("tsn").lower.contains(
        java.time.LocalDateTime.ofEpochSecond(0L, 0, java.time.ZoneOffset.UTC)))
      assert(fs.cols("tsn").upper.contains(
        java.time.LocalDateTime.ofEpochSecond(199999L, 0, java.time.ZoneOffset.UTC)))
      assert(fs.cols("id").nullCount.contains(0L))
    } finally prev.fold(spark.conf.unset("spark.sql.parquet.outputTimestampType"))(
      spark.conf.set("spark.sql.parquet.outputTimestampType", _))
  }

  test("seeded pruning-soundness fuzz: random decimal/timestamp data + random " +
      "predicates never lose a matching row to bounds pruning") {
    import org.apache.spark.sql.{sources => sqs}
    val rnd = new scala.util.Random(42)
    var prunedAtLeastOnce = false
    (1 to 3).foreach { round =>
      val dir = s"${tmpDir()}/fuzz$round"
      // values cluster around distinct centers so range files get
      // real, sometimes-overlapping bounds; ~5% nulls in each column
      val rows = (0 until 400).map { i =>
        val center = (i % 4) * 1000 - 2000
        val amt =
          if (rnd.nextInt(20) == 0) null
          else new java.math.BigDecimal(center + rnd.nextInt(500)).setScale(2)
        val ts =
          if (rnd.nextInt(20) == 0) null
          else java.time.LocalDateTime.ofEpochSecond(
            86400L * (center + 3000) + rnd.nextInt(40000), 0, java.time.ZoneOffset.UTC)
        val tag =
          if (rnd.nextInt(20) == 0) null
          else s"${('a' + rnd.nextInt(6)).toChar}${('a' + rnd.nextInt(3)).toChar}_${rnd.nextInt(100)}"
        org.apache.spark.sql.Row(i.toLong, amt, ts, tag)
      }
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("amt", org.apache.spark.sql.types.DecimalType(12, 2)),
        org.apache.spark.sql.types.StructField("tsn", org.apache.spark.sql.types.TimestampNTZType),
        org.apache.spark.sql.types.StructField("tag", org.apache.spark.sql.types.StringType)))
      // cluster by a different column each round: the clustered column
      // gets tight bounds (pruning fires), the others get overlapping
      // bounds (soundness under bound overlap is exercised too)
      val clusterCol = round match { case 1 => "amt"; case 2 => "tsn"; case _ => "tag" }
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 2), schema)
        .repartitionByRange(4 + rnd.nextInt(4), col(clusterCol))
      IcebergSource.commitAppend(spark, dir, df, 1L, 1L)
      val full = IcebergSource.read(spark, dir)
      val nAll = IcebergSource.dataFiles(dir).size
      (1 to 24).foreach { _ =>
        def basePred(): (sqs.Filter, org.apache.spark.sql.Column) = rnd.nextInt(10) match {
          case 0 =>
            val lit = new java.math.BigDecimal(rnd.nextInt(6000) - 3000).setScale(2)
            (sqs.LessThan("amt", lit): sqs.Filter, col("amt") < lit)
          case 1 =>
            val lit = new java.math.BigDecimal(rnd.nextInt(6000) - 3000).setScale(2)
            (sqs.GreaterThan("amt", lit): sqs.Filter, col("amt") > lit)
          case 2 =>
            val lit = new java.math.BigDecimal((rnd.nextInt(4) * 1000 - 2000) + rnd.nextInt(500)).setScale(2)
            (sqs.EqualTo("amt", lit): sqs.Filter, col("amt") === lit)
          case 3 =>
            val lit = java.time.LocalDateTime.ofEpochSecond(
              86400L * (rnd.nextInt(6000)), 0, java.time.ZoneOffset.UTC)
            (sqs.LessThan("tsn", lit): sqs.Filter, col("tsn") < lit)
          case 4 =>
            val lit = java.time.LocalDateTime.ofEpochSecond(
              86400L * (rnd.nextInt(6000)), 0, java.time.ZoneOffset.UTC)
            (sqs.GreaterThanOrEqual("tsn", lit): sqs.Filter, col("tsn") >= lit)
          case 5 =>
            val p = s"${('a' + rnd.nextInt(7)).toChar}" // sometimes 'g': zero matches
            (sqs.StringStartsWith("tag", p): sqs.Filter, col("tag").startsWith(p))
          case 6 =>
            val p = s"${('a' + rnd.nextInt(6)).toChar}${('a' + rnd.nextInt(4)).toChar}"
            (sqs.StringStartsWith("tag", p): sqs.Filter, col("tag").startsWith(p))
          case 7 =>
            val lit = new java.math.BigDecimal((rnd.nextInt(4) * 1000 - 2000) + rnd.nextInt(500)).setScale(2)
            (sqs.EqualNullSafe("amt", lit): sqs.Filter, col("amt") <=> lit)
          case 8 =>
            val c = Seq("amt", "tsn", "tag")(rnd.nextInt(3))
            (sqs.IsNull(c): sqs.Filter, col(c).isNull)
          case _ =>
            val c = Seq("amt", "tsn", "tag")(rnd.nextInt(3))
            (sqs.IsNotNull(c): sqs.Filter, col(c).isNotNull)
        }
        // combinator layer: plain, NOT, AND/OR, and the De Morgan
        // shapes the normalizer rewrites — each paired with the exact
        // Column predicate (Column ! / && / || are Kleene too)
        val (f, rowPred) = rnd.nextInt(6) match {
          case 0 => basePred()
          case 1 => val (a, pa) = basePred(); (sqs.Not(a): sqs.Filter, !pa)
          case 2 =>
            val (a, pa) = basePred(); val (b, pb) = basePred()
            (sqs.And(a, b): sqs.Filter, pa && pb)
          case 3 =>
            val (a, pa) = basePred(); val (b, pb) = basePred()
            (sqs.Or(a, b): sqs.Filter, pa || pb)
          case 4 =>
            val (a, pa) = basePred(); val (b, pb) = basePred()
            (sqs.Not(sqs.And(a, b)): sqs.Filter, !(pa && pb))
          case _ =>
            val (a, pa) = basePred(); val (b, pb) = basePred()
            (sqs.Not(sqs.Or(a, b)): sqs.Filter, !(pa || pb))
        }
        val expect = full.filter(rowPred).count()
        val planned = IcebergSource.dataFiles(dir, filters = Seq(f))
        if (planned.size < nAll) prunedAtLeastOnce = true
        val got = IcebergSource.read(spark, dir, filters = Seq(f)).filter(rowPred).count()
        assert(got == expect,
          s"pruning lost rows for $f: got $got expect $expect (planned ${planned.size}/$nAll)")
      }
    }
    assert(prunedAtLeastOnce, "fuzz must exercise at least one actual prune (non-vacuous)")
  }

  test("StringStartsWith pruning: bounds, identity partitions and truncate " +
      "transforms prune LIKE 'p%' soundly") {
    import org.apache.spark.sql.{sources => sqs}
    import spark.implicits._
    // succPrefix algebra: p <= s < succ(p) for every p-prefixed s
    assert(IcebergSource.succPrefix("ab").contains("ac"))
    assert(IcebergSource.succPrefix("a􏿿").contains("b")) // max cp tail walks left
    assert(IcebergSource.succPrefix(
      new String(Array(Character.MAX_CODE_POINT), 0, 1)).isEmpty)
    // UNPARTITIONED + bounds: tags cluster by leading letter
    val dir = s"${tmpDir()}/bounds"
    val prefixes = Seq("apple", "berry", "cherry", "damson")
    val df = (0 until 400).map(i => (i.toLong, s"${prefixes(i % 4)}_$i"))
      .toDF("id", "tag").repartitionByRange(4, col("tag"))
    IcebergSource.commitAppend(spark, dir, df, 1L, 1L)
    val all = IcebergSource.dataFiles(dir)
    val sw = IcebergSource.dataFiles(dir, filters = Seq(sqs.StringStartsWith("tag", "cherry")))
    assert(sw.nonEmpty && sw.size < all.size, s"bounds must prune LIKE: ${sw.size}/${all.size}")
    assert(IcebergSource.read(spark, dir,
        filters = Seq(sqs.StringStartsWith("tag", "cherry")))
      .filter($"tag".startsWith("cherry")).count() == 100)
    // prefix beyond the 16-cp bound truncation stays sound (kept files
    // still contain every match)
    val longDir = s"${tmpDir()}/long"
    val longTags = (0 until 200).map(i =>
      (i.toLong, s"${"x" * 20}${i % 2}_tail$i")) // shared 20-cp prefix
      .toDF("id", "tag").repartitionByRange(2, col("tag"))
    IcebergSource.commitAppend(spark, longDir, longTags, 1L, 1L)
    val p21 = "x" * 20 + "1"
    assert(IcebergSource.read(spark, longDir,
        filters = Seq(sqs.StringStartsWith("tag", p21)))
      .filter($"tag".startsWith(p21)).count() == 100)
    // IDENTITY partitions: LIKE decides per partition value
    val pdir = s"${tmpDir()}/part"
    val pdf = (0 until 300).map(i => (i.toLong, prefixes(i % 3))).toDF("id", "cat")
    IcebergSource.commitAppend(spark, pdir, pdf, 1L, 1L, partitionBy = Seq("cat"))
    val pAll = IcebergSource.dataFiles(pdir)
    val pSw = IcebergSource.dataFiles(pdir, filters = Seq(sqs.StringStartsWith("cat", "ap")))
    assert(pSw.nonEmpty && pSw.size < pAll.size)
    assert(IcebergSource.read(spark, pdir, filters = Seq(sqs.StringStartsWith("cat", "ap")))
      .filter($"cat".startsWith("ap")).count() == 100)
    // TRUNCATE[2] transform: short prefix decides via startsWith, long
    // prefix via equality with the truncated literal
    val tdir = s"${tmpDir()}/trunc"
    IcebergSource.commitAppend(spark, tdir, pdf, 1L, 1L,
      partitionSpec = Seq(IcebergSource.PartField("cat_t", "cat", "truncate[2]")))
    val tAll = IcebergSource.dataFiles(tdir)
    val tShort = IcebergSource.dataFiles(tdir, filters = Seq(sqs.StringStartsWith("cat", "b")))
    assert(tShort.nonEmpty && tShort.size < tAll.size, s"truncate short-prefix: ${tShort.size}/${tAll.size}")
    val tLong = IcebergSource.dataFiles(tdir, filters = Seq(sqs.StringStartsWith("cat", "apple")))
    assert(tLong.nonEmpty && tLong.size < tAll.size, s"truncate long-prefix: ${tLong.size}/${tAll.size}")
    assert(IcebergSource.read(spark, tdir, filters = Seq(sqs.StringStartsWith("cat", "apple")))
      .filter($"cat".startsWith("apple")).count() == 100)
  }

  test("NOT normalization: negated comparisons, De Morgan shapes, <=> and NOT LIKE " +
      "actually prune files; undecidable negations stay wrapped") {
    import org.apache.spark.sql.{sources => sqs}
    import spark.implicits._
    // rewrite algebra: every rewrite is truth-set-exact under Kleene 3VL
    val n = IcebergSource.normalizeNot _
    assert(n(sqs.Not(sqs.GreaterThan("a", 5))) == sqs.LessThanOrEqual("a", 5))
    assert(n(sqs.Not(sqs.Not(sqs.LessThan("a", 5)))) == sqs.LessThan("a", 5))
    assert(n(sqs.Not(sqs.And(sqs.GreaterThan("a", 5), sqs.IsNull("b")))) ==
      sqs.Or(sqs.LessThanOrEqual("a", 5), sqs.IsNotNull("b")))
    assert(n(sqs.EqualNullSafe("a", null)) == sqs.IsNull("a"))
    assert(n(sqs.EqualNullSafe("a", 5)) == sqs.EqualTo("a", 5))
    assert(n(sqs.Not(sqs.EqualNullSafe("a", null))) == sqs.IsNotNull("a"))
    assert(n(sqs.Not(sqs.EqualNullSafe("a", 5))) ==
      sqs.Or(sqs.IsNull("a"), sqs.Not(sqs.EqualTo("a", 5))))
    n(sqs.Not(sqs.In("a", Array(1, 2)))) match {
      case sqs.And(sqs.Not(sqs.EqualTo("a", 1)), sqs.Not(sqs.EqualTo("a", 2))) =>
      case other => fail(s"NOT IN must rewrite to a ≠ conjunction, got $other")
    }
    // a null IN element makes NOT IN unsatisfiable-or-null: stays
    // wrapped (conservative retention, never a wrong prune)
    n(sqs.Not(sqs.In("a", Array(1, null)))) match {
      case sqs.Not(sqs.In("a", _)) =>
      case other => fail(s"NOT IN with null element must stay wrapped, got $other")
    }
    // a null comparison literal satisfies no row either way: stays wrapped
    n(sqs.Not(sqs.GreaterThan("a", null))) match {
      case sqs.Not(sqs.GreaterThan("a", _)) =>
      case other => fail(s"NOT > null must stay wrapped, got $other")
    }

    // UNPARTITIONED bounds: 4 range files over id [0,99]..[300,399],
    // each file's tags share one prefix
    val dir = s"${tmpDir()}/notbounds"
    val prefixes = Seq("apple", "berry", "cherry", "damson")
    val df = (0 until 400).map(i => (i.toLong, s"${prefixes(i / 100)}_$i"))
      .toDF("id", "tag").repartitionByRange(4, col("id"))
    IcebergSource.commitAppend(spark, dir, df, 1L, 1L)
    val nAll = IcebergSource.dataFiles(dir).size
    assert(nAll >= 3, s"fixture needs multiple range files, got $nAll")
    def planned(f: sqs.Filter): Int = IcebergSource.dataFiles(dir, filters = Seq(f)).size
    def readCount(f: sqs.Filter, p: org.apache.spark.sql.Column): Long =
      IcebergSource.read(spark, dir, filters = Seq(f)).filter(p).count()
    // NOT(id < 200) → id >= 200: low-range files pruned, rows exact
    val notLt = sqs.Not(sqs.LessThan("id", 200L))
    assert(planned(notLt) < nAll, "NOT(<) must prune via the >= dual")
    assert(readCount(notLt, !($"id" < 200L)) == 200L)
    // De Morgan: NOT(id < 100 OR id >= 300) → 100 <= id < 300
    val dm = sqs.Not(sqs.Or(sqs.LessThan("id", 100L), sqs.GreaterThanOrEqual("id", 300L)))
    assert(planned(dm) < nAll - 1, "NOT(OR) must prune both outer range files")
    assert(readCount(dm, !($"id" < 100L || $"id" >= 300L)) == 200L)
    // NOT LIKE 'apple%': the file whose bounds are both apple-prefixed is pruned
    val notLike = sqs.Not(sqs.StringStartsWith("tag", "apple"))
    assert(planned(notLike) < nAll, "NOT LIKE must prune an all-prefix file")
    assert(readCount(notLike, !$"tag".startsWith("apple")) == 300L)
    // <=> literal prunes like equality; <=> null prunes ALL files (no nulls)
    assert(planned(sqs.EqualNullSafe("id", 250L)) < nAll)
    assert(planned(sqs.EqualNullSafe("tag", null)) == 0,
      "tag <=> NULL over null-free files must prune everything")
    assert(readCount(sqs.EqualNullSafe("tag", null), $"tag".isNull) == 0L)

    // IDENTITY partitions: NOT IN and NOT LIKE decide per partition value
    val pdir = s"${tmpDir()}/notpart"
    val pdf = (0 until 400).map(i => (i.toLong, prefixes(i % 4))).toDF("id", "cat")
    IcebergSource.commitAppend(spark, pdir, pdf, 1L, 1L, partitionBy = Seq("cat"))
    val pAll = IcebergSource.dataFiles(pdir).size
    val notIn = sqs.Not(sqs.In("cat", Array("apple", "berry", "cherry")))
    val pNotIn = IcebergSource.dataFiles(pdir, filters = Seq(notIn))
    assert(pNotIn.size < pAll && pNotIn.nonEmpty,
      s"NOT IN must keep only the damson partition: ${pNotIn.size}/$pAll")
    assert(IcebergSource.read(spark, pdir, filters = Seq(notIn))
      .filter(!$"cat".isin("apple", "berry", "cherry")).count() == 100L)
    val pNotLike = IcebergSource.dataFiles(pdir,
      filters = Seq(sqs.Not(sqs.StringStartsWith("cat", "ap"))))
    assert(pNotLike.size < pAll, "identity NOT LIKE must prune the apple partition")
  }

  test("commit reads no data pages: stats come from footers, input bytes stay " +
      "metadata-sized") {
    import spark.implicits._
    val dir = s"${tmpDir()}/tbl"
    // ~1M rows from memory: any regression to a re-read of the written
    // parquet would record MBs of task input bytes
    val big = spark.range(1000000L).select(col("id"),
      (col("id") % 97).as("k"), concat(lit("row"), col("id")).as("tag"))
    val bytesRead = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          bytesRead.addAndGet(t.taskMetrics.inputMetrics.bytesRead)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      IcebergSource.commitAppend(spark, dir, big.repartition(8), 1L, 1L)
      Thread.sleep(500) // let straggler task-end events drain
    } finally spark.sparkContext.removeSparkListener(listener)
    val dataBytes = IcebergSource.dataFiles(dir).map(_.sizeBytes).sum
    assert(dataBytes > (2L << 20), s"fixture too small: $dataBytes")
    assert(bytesRead.get() < dataBytes / 10,
      s"commit read ${bytesRead.get()} input bytes against $dataBytes written — " +
        "stats must come from footers, not a second scan")
    // and the footer-derived stats are REAL: counts + bounds match
    val files = IcebergSource.dataFiles(dir)
    assert(files.map(_.recordCount).sum == 1000000L)
    val meta = IcebergSource.readMeta(dir)
    val idId = meta.fieldNamesById.map(_.swap).apply("id").toInt
    val los = files.flatMap(f => f.lowerBounds.get(idId))
      .flatMap(IcebergSource.deserializeBound("long", _)).map(_.asInstanceOf[Long])
    val his = files.flatMap(f => f.upperBounds.get(idId))
      .flatMap(IcebergSource.deserializeBound("long", _)).map(_.asInstanceOf[Long])
    assert(los.min == 0L && his.max == 999999L)
  }

  test("snapshot-expiry GC: unreachable files deleted, reads exact, and the " +
      "crash window between metadata flip and deletion stays readable") {
    import org.apache.spark.sql.functions.expr
    import scala.jdk.CollectionConverters._
    import spark.implicits._
    val dir = s"${tmpDir()}/tbl"
    IcebergSource.commitAppend(spark, dir, nums(0, 50), 1L, 1L)
    val paths = IcebergSource.dataFiles(dir).map(_.path)
    val posDf = spark.read.parquet(paths: _*)
      .select(col("id"), expr("_metadata.file_path").as("file_path"),
        expr("_metadata.row_index").as("pos"))
      .filter(col("id") % 5 === 0).select("file_path", "pos")
    IcebergSource.commitDeletes(spark, dir, posDeletes = Some(posDf),
      snapshotId = 2L, timestampMs = 2L)
    // compaction rewrites every file (deletes fold in) → snapshot 1's
    // data files and snapshot 2's delete files become historical
    IcebergSource.compact(spark, dir, 3L, 3L)
    val expect = (0 until 50).filterNot(_ % 5 == 0).map(_.toLong).toSet
    assert(IcebergSource.read(spark, dir).select("id").as[Long].collect().toSet == expect)

    def allFiles(): Set[String] = {
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      try s.iterator().asScala.filter(java.nio.file.Files.isRegularFile(_))
        .map(_.toString).toSet
      finally s.close()
    }
    val beforeExpiry = allFiles()

    // CRASH WINDOW: metadata flips, GC never runs — the table must
    // read exactly, with every pre-expiry file still on disk (orphans
    // only, never dangling references)
    IcebergSource.expireSnapshots(dir, keep = Set(3L), timestampMs = 4L, gc = false)
    assert(IcebergSource.read(spark, dir).select("id").as[Long].collect().toSet == expect)
    assert(allFiles().intersect(beforeExpiry) == beforeExpiry,
      "the flip-only half of expiry must delete nothing")
    // time travel to the expired snapshot now fails typed
    intercept[IllegalArgumentException](IcebergSource.read(spark, dir, Some(1L)))

    // GC (the re-runnable second half): orphans removed, reads exact
    val deleted = IcebergSource.gcUnreachableFiles(dir)
    assert(deleted.nonEmpty, "expired snapshots must leave something to collect")
    assert(deleted.exists(_.contains("/data/snap-1/")), "snap-1 data files are orphans")
    assert(deleted.exists(_.contains("snap-2-pos-deletes")), "old delete files are orphans")
    assert(deleted.exists(_.endsWith("-manifest-list.avro")),
      "expired snapshots' manifest lists are orphans")
    assert(IcebergSource.read(spark, dir).select("id").as[Long].collect().toSet == expect)
    // live files survive: the current snapshot still plans and reads
    val live = IcebergSource.dataFiles(dir).map(_.path).toSet
    assert(live.forall(p => java.nio.file.Files.exists(java.nio.file.Paths.get(p))))
    // idempotent: a second pass (crash-rerun shape) finds nothing
    assert(IcebergSource.gcUnreachableFiles(dir).isEmpty)
    // old metadata.json history is kept by design (pinned readers)
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$dir/metadata/v1.metadata.json")))
  }

  test("format-version 1 tables: readable, but every commit path refuses typed") {
    val dir = s"${tmpDir()}/tbl"
    IcebergSource.commitAppend(spark, dir, nums(0, 20), 1L, 1L)
    val metaPath = java.nio.file.Paths.get(s"$dir/metadata/v1.metadata.json")
    val json = new String(java.nio.file.Files.readAllBytes(metaPath), "UTF-8")
    java.nio.file.Files.write(metaPath,
      json.replace("\"format-version\":2", "\"format-version\":1").getBytes("UTF-8"))
    assert(IcebergSource.readMeta(dir).formatVersion == 1L)
    assert(IcebergSource.read(spark, dir).count() == 20, "v1 reads stay supported")
    val e1 = intercept[graft.core.GraftError.Plan](
      IcebergSource.commitAppend(spark, dir, nums(20, 30), 2L, 2L))
    assert(e1.getMessage.contains("format-version 1"))
    import spark.implicits._
    val e2 = intercept[graft.core.GraftError.Plan](
      IcebergSource.commitDeletes(spark, dir,
        eqDeletes = Some((Seq("row1").toDF("tag"), Seq("tag"))),
        snapshotId = 2L, timestampMs = 2L))
    assert(e2.getMessage.contains("format-version 1"))
    val e3 = intercept[graft.core.GraftError.Plan](
      IcebergSource.compact(spark, dir, 2L, 2L))
    assert(e3.getMessage.contains("format-version 1"))
  }

  test("schema evolution: rename + add + drop resolve by FIELD ID across old and new files") {
    import spark.implicits._
    val dir = s"${tmpDir()}/tbl"
    // snapshot 1 under schema 0: (id, tag, v)
    IcebergSource.commitAppend(spark, dir, nums(0, 10), 1L, 1L)
    // evolve: rename v -> value, drop tag, add note (string)
    val m = IcebergSource.alterSchema(dir, timestampMs = 2L,
      renames = Map("v" -> "value"), adds = Seq("note" -> "string"), drops = Seq("tag"))
    assert(m.currentSchema.map(_.name) == Seq("id", "value", "note"))
    assert(m.schemaEvolved && m.currentSchemaId == 1L)
    // renamed field keeps its id; added field got a FRESH id above all
    val v0 = m.schemasById(0L).find(_.name == "v").get
    val valueF = m.currentSchema.find(_.name == "value").get
    assert(valueF.id == v0.id, "rename must keep the field id")
    val noteF = m.currentSchema.find(_.name == "note").get
    assert(noteF.id > m.schemasById(0L).map(_.id).max, "added column needs a fresh id")

    // snapshot 2 under schema 1
    val df2 = (10 until 20).map(i => (i.toLong, i * 1.5, s"n$i")).toDF("id", "value", "note")
    IcebergSource.commitAppend(spark, dir, df2, 2L, 3L)

    // full read: current names; old files expose v AS value, note null
    val all = IcebergSource.read(spark, dir)
    assert(all.columns.toSeq == Seq("id", "value", "note"))
    assert(all.count() == 20)
    assert(all.filter($"id" === 3L).select("value").as[Double].head() == 4.5)
    assert(all.filter($"id" < 10).filter($"note".isNotNull).count() == 0)
    assert(all.filter($"id" >= 10).filter($"note".isNull).count() == 0)
    assert(!all.columns.contains("tag"), "dropped column must not resurface")

    // time travel to snapshot 1 reads with snapshot 1's SCHEMA
    val old = IcebergSource.read(spark, dir, Some(1L))
    assert(old.columns.toSeq == Seq("id", "tag", "v"))
    assert(old.count() == 10)

    // appends must match the CURRENT schema exactly
    val e = intercept[graft.core.GraftError.Plan](
      IcebergSource.commitAppend(spark, dir, nums(20, 30), 3L, 4L))
    assert(e.getMessage.contains("current schema"))

    // incremental window ending at snapshot 2 exposes the new names
    val inc = IcebergSource.readIncremental(spark, dir, Some(1L), 2L)
    assert(inc.columns.toSeq == Seq("id", "value", "note"))
    assert(inc.count() == 10 && inc.agg(min("id")).head().getLong(0) == 10L)
  }

  test("schema evolution: equality deletes committed under the OLD name still apply; " +
      "stats pruning works under the NEW name; compaction consolidates") {
    import org.apache.spark.sql.{sources => sqs}
    import spark.implicits._
    val dir = s"${tmpDir()}/tbl"
    // 4 files with disjoint id ranges so bounds pruning is observable
    val df0 = spark.range(0, 40).select($"id",
        concat(lit("t"), $"id" % 4).as("tag"), ($"id" * 1.5).as("v"))
      .repartitionByRange(4, $"id")
    IcebergSource.commitAppend(spark, dir, df0, 1L, 1L)
    // equality delete on tag under the OLD schema (ids embedded)
    IcebergSource.commitDeletes(spark, dir,
      eqDeletes = Some((Seq("t1").toDF("tag"), Seq("tag"))), snapshotId = 2L, timestampMs = 2L)
    assert(IcebergSource.read(spark, dir).count() == 30)

    // rename BOTH the delete key column and the bounds column
    IcebergSource.alterSchema(dir, timestampMs = 3L,
      renames = Map("tag" -> "label", "id" -> "ident"))
    val after = IcebergSource.read(spark, dir)
    assert(after.columns.toSeq == Seq("ident", "label", "v"))
    assert(after.count() == 30, "eq delete must keep applying across the rename")
    assert(after.filter($"label" === "t1").count() == 0)

    // stats pruning under the NEW name: bounds were written under the
    // field id, so a selective predicate still skips disjoint files
    val pruned = IcebergSource.dataFiles(dir, filters = Seq(sqs.EqualTo("ident", 6L)))
    assert(pruned.size < IcebergSource.dataFiles(dir).size,
      "bounds pruning must survive the rename")
    // id 6 has tag t2 (not deleted); the pruned read must still find it
    assert(IcebergSource.read(spark, dir, filters = Seq(sqs.EqualTo("ident", 6L)))
      .filter($"ident" === 6L).count() == 1)

    // compaction folds the delete in and rewrites under CURRENT names
    IcebergSource.compact(spark, dir, 4L, 4L)
    val compacted = IcebergSource.read(spark, dir)
    assert(compacted.columns.toSeq == Seq("ident", "label", "v"))
    assert(compacted.count() == 30)
    assert(compacted.filter($"label" === "t1").count() == 0)
    // rewritten files physically carry the current names
    val fids = graft.sources.ParquetFooters
      .fieldIdsOf(IcebergSource.dataFiles(dir).head.path)
    assert(fids.contains("ident") && fids.contains("label"), s"got $fids")
  }

  test("alterSchema refusals: unknown columns, collisions, partition sources, " +
      "live equality-delete keys, v1 tables") {
    import spark.implicits._
    val dir = s"${tmpDir()}/tbl"
    IcebergSource.commitAppend(spark, dir, nums(0, 10), 1L, 1L, partitionBy = Seq("tag"))
    def planErr(f: => Any): String =
      intercept[graft.core.GraftError.Plan](f).getMessage
    assert(planErr(IcebergSource.alterSchema(dir, 2L, renames = Map("nope" -> "x")))
      .contains("unknown column"))
    assert(planErr(IcebergSource.alterSchema(dir, 2L, renames = Map("v" -> "id")))
      .contains("duplicate"))
    assert(planErr(IcebergSource.alterSchema(dir, 2L, drops = Seq("tag")))
      .contains("partition-spec source"))
    assert(planErr(IcebergSource.alterSchema(dir, 2L, adds = Seq("x" -> "wibble")))
      .contains("no Spark type"))

    // live equality delete holds its key column in place
    val dir2 = s"${tmpDir()}/tbl2"
    IcebergSource.commitAppend(spark, dir2, nums(0, 10), 1L, 1L)
    IcebergSource.commitDeletes(spark, dir2,
      eqDeletes = Some((Seq("row3").toDF("tag"), Seq("tag"))), snapshotId = 2L, timestampMs = 2L)
    assert(planErr(IcebergSource.alterSchema(dir2, 3L, drops = Seq("tag")))
      .contains("equality deletes"))
    // ...but renaming the key is fine, and the delete still applies
    IcebergSource.alterSchema(dir2, 4L, renames = Map("tag" -> "label"))
    assert(IcebergSource.read(spark, dir2).filter(col("label") === "row3").count() == 0)
    assert(IcebergSource.read(spark, dir2).count() == 9)
  }

  test("partition-spec evolution: new layout mints a new spec id, old files keep " +
      "pruning under their own spec, matching layouts reuse ids") {
    import org.apache.spark.sql.{sources => sqs}
    import spark.implicits._
    val dir = s"${tmpDir()}/tbl"
    // era 1: identity-partitioned by region
    val df1 = Seq((1L, "eu", 10L), (2L, "us", 20L)).toDF("id", "region", "k")
    IcebergSource.commitAppend(spark, dir, df1, 1L, 1L, partitionBy = Seq("region"))
    // era 2: re-laid-out by k — a NEW spec id becomes the default
    val df2 = Seq((3L, "eu", 30L), (4L, "us", 40L)).toDF("id", "region", "k")
    val m2 = IcebergSource.commitAppend(spark, dir, df2, 2L, 2L, partitionBy = Seq("k"))
    assert(m2.specsById.keySet == Set(0L, 1L), "both specs recorded")
    assert(m2.defaultSpecId == 1L && m2.spec.map(_.source) == Seq("k"))
    // every row still reads
    assert(IcebergSource.read(spark, dir).count() == 4)
    // files carry their manifest's spec id
    val all = IcebergSource.dataFiles(dir)
    assert(all.filter(_.specId == 0L).forall(_.partition.contains("region")))
    assert(all.filter(_.specId == 1L).forall(_.partition.contains("k")))
    // a region predicate prunes era-1 files by PARTITION (exactly),
    // and the read stays row-exact across both eras
    val regFiles = IcebergSource.dataFiles(dir, filters = Seq(sqs.EqualTo("region", "eu")))
    val era1 = regFiles.filter(_.specId == 0L)
    assert(era1.nonEmpty && era1.forall(_.partition("region") == "eu"),
      "era-1 us-partition file must be partition-pruned")
    assert(IcebergSource.read(spark, dir, filters = Seq(sqs.EqualTo("region", "eu")))
      .filter($"region" === "eu").select("id").as[Long].collect().toSet == Set(1L, 3L))
    // a k predicate prunes era-2 files by partition; era-1 rows exact
    val kFiles = IcebergSource.dataFiles(dir, filters = Seq(sqs.EqualTo("k", 40L)))
    val era2k = kFiles.filter(_.specId == 1L)
    assert(era2k.nonEmpty && era2k.forall(_.partition("k") == 40L))
    assert(IcebergSource.read(spark, dir, filters = Seq(sqs.EqualTo("k", 40L)))
      .filter($"k" === 40L).select("id").as[Long].collect().toSet == Set(4L))
    // era 3: the SAME layout as era 1 REUSES spec id 0 (no
    // proliferation) and flips the default back
    val df3 = Seq((5L, "de", 50L)).toDF("id", "region", "k")
    val m3 = IcebergSource.commitAppend(spark, dir, df3, 3L, 3L, partitionBy = Seq("region"))
    assert(m3.specsById.keySet == Set(0L, 1L), "matching layout must not mint a new spec")
    assert(m3.defaultSpecId == 0L)
    // era 4: no partitionBy inherits the DEFAULT (region again)
    val df4 = Seq((6L, "fr", 60L)).toDF("id", "region", "k")
    IcebergSource.commitAppend(spark, dir, df4, 4L, 4L)
    val m4 = IcebergSource.readMeta(dir)
    assert(m4.defaultSpecId == 0L && m4.specsById.keySet == Set(0L, 1L))
    assert(IcebergSource.read(spark, dir).count() == 6)
    // incremental windows resolve each manifest's own spec too
    val added = IcebergSource.addedFiles(dir, Some(2L), 4L,
      filters = Seq(sqs.EqualTo("region", "de")))
    assert(added.forall(f => f.specId == 0L && f.partition("region") == "de"))
  }

  test("refs: tags pin snapshots immutably, branches fork and advance beside " +
      "main, expiry refuses to drop pinned snapshots") {
    import spark.implicits._
    val dir = s"${tmpDir()}/tbl"
    IcebergSource.commitAppend(spark, dir, nums(0, 10), 1L, 1L)
    IcebergSource.commitAppend(spark, dir, nums(10, 20), 2L, 2L)
    // TAG snapshot 1: reads at the tag stay pinned as main moves on
    IcebergSource.tagSnapshot(dir, "v1", 1L, 3L)
    assert(IcebergSource.readRef(spark, dir, "v1").count() == 10)
    assert(IcebergSource.read(spark, dir).count() == 20)
    // tags are immutable: same-id retag is an idempotent no-op (no
    // version churn), moving it refuses typed
    val vBefore = IcebergSource.currentVersion(dir)
    IcebergSource.tagSnapshot(dir, "v1", 1L, 4L)
    assert(IcebergSource.currentVersion(dir) == vBefore)
    assert(intercept[graft.core.GraftError.Plan](
      IcebergSource.tagSnapshot(dir, "v1", 2L, 5L)).getMessage.contains("never silently move"))
    // BRANCH from snapshot 1; a branch commit advances dev, not main
    IcebergSource.createBranch(dir, "dev", Some(1L), 6L)
    IcebergSource.commitAppend(spark, dir, nums(100, 105), 31L, 7L,
      toBranch = Some("dev"))
    assert(IcebergSource.readRef(spark, dir, "dev").count() == 15,
      "dev = snapshot 1's 10 rows + the branch commit's 5")
    assert(IcebergSource.read(spark, dir).count() == 20, "main untouched")
    val m = IcebergSource.readMeta(dir)
    assert(m.currentSnapshotId.contains(2L))
    assert(m.refs("dev") == IcebergSource.SnapshotRef(31L, "branch"))
    assert(m.snapshot(31L).parentId.contains(1L), "branch lineage forks at the base")
    // a MAIN commit carries the refs forward and leaves dev alone
    IcebergSource.commitAppend(spark, dir, nums(20, 25), 4L, 8L)
    val m2 = IcebergSource.readMeta(dir)
    assert(m2.currentSnapshotId.contains(4L) && m2.refs.keySet == Set("v1", "dev"))
    assert(IcebergSource.readRef(spark, dir, "dev").count() == 15)
    // committing to a TAG refuses; unknown refs refuse on read
    assert(intercept[graft.core.GraftError.Plan](
      IcebergSource.commitAppend(spark, dir, nums(0, 1), 5L, 9L, toBranch = Some("v1")))
      .getMessage.contains("TAG"))
    assert(intercept[graft.core.GraftError.Plan](
      IcebergSource.readRef(spark, dir, "nope")).getMessage.contains("unknown ref"))
    // EXPIRY: dropping snapshot 1 while v1/dev lineage pins it refuses;
    // after dropping the refs (and the branch head), it succeeds
    assert(intercept[graft.core.GraftError.Plan](
      IcebergSource.expireSnapshots(dir, Set(2L, 4L, 31L), 10L))
      .getMessage.contains("pinned by refs"))
    IcebergSource.dropRef(dir, "v1", 11L)
    IcebergSource.dropRef(dir, "dev", 12L)
    assert(intercept[graft.core.GraftError.Plan](
      IcebergSource.dropRef(dir, "v1", 13L)).getMessage.contains("no ref"))
    IcebergSource.expireSnapshots(dir, Set(2L, 4L), 14L)
    assert(IcebergSource.read(spark, dir).count() == 25)
  }

  test("mergeUpsert: matched keys take the new version, unmatched survive, " +
      "re-upserts stack, and compaction folds the delete pair away") {
    import spark.implicits._
    val dir = s"${tmpDir()}/tbl"
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "tag", "v")
    IcebergSource.commitAppend(spark, dir, base, 1L, 1L)
    // upsert: id 2 changes, id 4 is new
    val up = Seq((2L, "B", 200.0), (4L, "d", 40.0)).toDF("id", "tag", "v")
    IcebergSource.mergeUpsert(spark, dir, up, Seq("id"), 2L, 3L, 2L)
    val r1 = IcebergSource.read(spark, dir).orderBy("id")
      .as[(Long, String, Double)].collect().toSeq
    assert(r1 == Seq((1L, "a", 10.0), (2L, "B", 200.0), (3L, "c", 30.0), (4L, "d", 40.0)))
    // a second upsert of the SAME key beats the first (sequence order)
    IcebergSource.mergeUpsert(spark, dir,
      Seq((2L, "BB", 2000.0)).toDF("id", "tag", "v"), Seq("id"), 4L, 5L, 3L)
    val r2 = IcebergSource.read(spark, dir).filter($"id" === 2L)
      .as[(Long, String, Double)].collect().toSeq
    assert(r2 == Seq((2L, "BB", 2000.0)))
    assert(IcebergSource.read(spark, dir).count() == 4)
    // compaction folds the merge-on-read pairs into plain data files
    IcebergSource.compact(spark, dir, 6L, 4L)
    val (files, dels) = IcebergSource.planFiles(dir)
    assert(dels.isEmpty, "compaction must retire the delete files")
    assert(IcebergSource.read(spark, dir).count() == 4)
    assert(IcebergSource.read(spark, dir).filter($"id" === 2L)
      .select("tag").as[String].head() == "BB")
  }

  test("write sort order: sortBy range-clusters files so range predicates prune; " +
      "the order records in metadata and carries forward") {
    import org.apache.spark.sql.{sources => sqs}
    import spark.implicits._
    // shuffled ids: without sortBy every file's bounds span the whole
    // range and nothing prunes
    val rows = new scala.util.Random(7).shuffle((0 until 4000).toList)
      .map(i => (i.toLong, s"row$i"))
    val dfShuffled = rows.toDF("id", "tag").repartition(8)
    val dirU = s"${tmpDir()}/unsorted"
    IcebergSource.commitAppend(spark, dirU, dfShuffled, 1L, 1L)
    val dirS = s"${tmpDir()}/sorted"
    IcebergSource.commitAppend(spark, dirS, dfShuffled, 1L, 1L, sortBy = Seq("id"))
    val f = Seq(sqs.LessThan("id", 500L): sqs.Filter)
    val unsortedPlanned = IcebergSource.dataFiles(dirU, filters = f).size
    val unsortedAll = IcebergSource.dataFiles(dirU).size
    val sortedPlanned = IcebergSource.dataFiles(dirS, filters = f).size
    val sortedAll = IcebergSource.dataFiles(dirS).size
    assert(unsortedPlanned == unsortedAll, "shuffled layout cannot prune (sanity)")
    assert(sortedPlanned < sortedAll, "sorted layout must prune most files")
    // rows stay exact either way
    assert(IcebergSource.read(spark, dirS, filters = f)
      .filter($"id" < 500L).count() == 500)
    // metadata records the order; an unsorted follow-up append carries
    // it forward (advisory), and readMeta surfaces the column
    assert(IcebergSource.readMeta(dirS).sortOrder == Seq("id"))
    IcebergSource.commitAppend(spark, dirS,
      Seq((9000L, "x")).toDF("id", "tag"), 2L, 2L)
    assert(IcebergSource.readMeta(dirS).sortOrder == Seq("id"))
    // compaction APPLIES the recorded order to an unsorted table: the
    // shuffled twin gains pruning after declaring the order + compacting
    IcebergSource.commitAppend(spark, dirU,
      Seq((9000L, "x")).toDF("id", "tag"), 2L, 2L, sortBy = Seq("id"))
    // ~6.5KB per 500-row file → every file rewrites, total ~52KB / 12KB
    // size target → 4 sorted output files
    IcebergSource.compact(spark, dirU, 3L, 3L, smallFileBytes = 12288L)
    val compactedPlanned = IcebergSource.dataFiles(dirU, filters = f).size
    val compactedAll = IcebergSource.dataFiles(dirU).size
    assert(compactedAll > 1 && compactedPlanned < compactedAll,
      s"compaction must lay rewritten files out by the table sort order " +
        s"($compactedPlanned/$compactedAll)")
    assert(IcebergSource.read(spark, dirU, filters = f).filter($"id" < 500L).count() == 500)
  }

  test("z-order clustering: predicates on EVERY z column prune files; a plain sort " +
      "prunes only its first column") {
    import org.apache.spark.sql.{sources => sqs}
    import spark.implicits._
    // x and y independent → lexicographic sort on x leaves y bounds
    // full-range in every file; z-order tightens both
    val rnd = new scala.util.Random(11)
    val rows = (0 until 4000).map(i => (i.toLong, rnd.nextInt(10000).toLong))
    val df = rnd.shuffle(rows).toDF("x", "y").repartition(8)
    val dirZ = s"${tmpDir()}/z"
    IcebergSource.commitAppend(spark, dirZ, df, 1L, 1L, zorderBy = Seq("x", "y"))
    val dirX = s"${tmpDir()}/x"
    IcebergSource.commitAppend(spark, dirX, df, 1L, 1L, sortBy = Seq("x"))
    val fx = Seq(sqs.LessThan("x", 400L): sqs.Filter)
    val fy = Seq(sqs.LessThan("y", 1000L): sqs.Filter)
    val zAll = IcebergSource.dataFiles(dirZ).size
    assert(IcebergSource.dataFiles(dirZ, filters = fx).size < zAll,
      "z-order must prune on x")
    assert(IcebergSource.dataFiles(dirZ, filters = fy).size < zAll,
      "z-order must prune on y")
    val xAll = IcebergSource.dataFiles(dirX).size
    assert(IcebergSource.dataFiles(dirX, filters = fx).size < xAll,
      "sort prunes its own column (sanity)")
    assert(IcebergSource.dataFiles(dirX, filters = fy).size == xAll,
      "sort cannot prune an uncorrelated second column (the gap z-order closes)")
    // rows stay exact under both layouts
    val expX = df.filter($"x" < 400L).count()
    val expY = df.filter($"y" < 1000L).count()
    assert(IcebergSource.read(spark, dirZ, filters = fx).filter($"x" < 400L).count() == expX)
    assert(IcebergSource.read(spark, dirZ, filters = fy).filter($"y" < 1000L).count() == expY)
  }

  test("branch commits interoperate with partition-spec evolution and incremental " +
      "windows: branch-side spec allocation is table-wide, lineage windows resolve") {
    import org.apache.spark.sql.{sources => sqs}
    import spark.implicits._
    val dir = s"${tmpDir()}/tbl"
    val df1 = Seq((1L, "eu", 10L), (2L, "us", 20L)).toDF("id", "region", "k")
    IcebergSource.commitAppend(spark, dir, df1, 1L, 1L, partitionBy = Seq("region"))
    IcebergSource.createBranch(dir, "dev", Some(1L), 2L)
    // a BRANCH commit under a NEW layout mints a table-wide spec id
    val df2 = Seq((3L, "de", 30L), (4L, "fr", 40L)).toDF("id", "region", "k")
    IcebergSource.commitAppend(spark, dir, df2, 21L, 3L,
      partitionBy = Seq("k"), toBranch = Some("dev"))
    val m = IcebergSource.readMeta(dir)
    assert(m.specsById.keySet == Set(0L, 1L) && m.defaultSpecId == 1L)
    assert(m.currentSnapshotId.contains(1L), "main head unmoved")
    // branch read prunes branch-era files under the branch's spec
    val fs = IcebergSource.dataFiles(dir, snapshotId = Some(21L),
      filters = Seq(sqs.EqualTo("k", 30L)))
    assert(fs.filter(_.specId == 1L).forall(_.partition("k") == 30L))
    assert(IcebergSource.readRef(spark, dir, "dev").count() == 4)
    // incremental window along the branch lineage
    val added = IcebergSource.addedFiles(dir, Some(1L), 21L)
    assert(added.nonEmpty && added.forall(_.specId == 1L))
    // a MAIN commit after the branch keeps both specs; main inherits
    // the (now-default) k layout when no partitionBy is given
    val df3 = Seq((5L, "it", 50L)).toDF("id", "region", "k")
    IcebergSource.commitAppend(spark, dir, df3, 3L, 4L)
    val m2 = IcebergSource.readMeta(dir)
    assert(m2.specsById.keySet == Set(0L, 1L) && m2.refs.keySet == Set("dev"))
    assert(IcebergSource.read(spark, dir).count() == 3)
    assert(IcebergSource.readRef(spark, dir, "dev").count() == 4)
  }

  test("compaction across partition-spec eras: carried files keep their OWN spec's " +
      "manifest — no null-filled foreign partition fields, no silent row loss") {
    import org.apache.spark.sql.{sources => sqs}
    import spark.implicits._
    val dir = s"${tmpDir()}/tbl"
    // era A (spec 0): 2000 rows partitioned by region — two ~big files
    val a = (0 until 2000).map(i =>
      (i.toLong, if (i % 2 == 0) "eu" else "us", i.toLong)).toDF("id", "region", "k")
    IcebergSource.commitAppend(spark, dir, a, 1L, 1L, partitionBy = Seq("region"))
    // era B (spec 1, new default): tiny files partitioned by k
    val b = Seq((10000L, "de", 10000L), (10001L, "de", 10001L)).toDF("id", "region", "k")
    IcebergSource.commitAppend(spark, dir, b, 2L, 2L, partitionBy = Seq("k"))
    // compact: only era B's tiny files rewrite; era A's files (non-default
    // spec 0) are CARRIED — the path that once re-encoded them into the
    // default spec's struct with k=null (read back as provable null → a
    // k-predicate pruned real rows)
    IcebergSource.compact(spark, dir, 3L, 3L, smallFileBytes = 2048)
    assert(IcebergSource.read(spark, dir).count() == 2002)
    val files = IcebergSource.dataFiles(dir)
    assert(files.exists(_.specId == 0L), "era-A files carried under their own spec id")
    // the bug probe: a default-spec-source predicate must NOT prune the
    // carried era-A files (their spec never laid k out — no info)
    assert(IcebergSource.read(spark, dir, filters = Seq(sqs.EqualTo("k", 1500L)))
      .filter($"k" === 1500L).count() == 1,
      "carried old-spec file wrongly pruned by a new-spec predicate")
    // and the carried files still prune EXACTLY under their own spec
    val eu = IcebergSource.dataFiles(dir, filters = Seq(sqs.EqualTo("region", "eu")))
    assert(eu.filter(_.specId == 0L).forall(_.partition("region") == "eu"),
      "era-A us-partition file must still prune by its own spec after compaction")
    assert(IcebergSource.read(spark, dir, filters = Seq(sqs.EqualTo("region", "eu")))
      .filter($"region" === "eu").count() == 1000)
  }

  test("readAsOf: timestamp time travel resolves the newest main snapshot at or " +
      "before the instant; branch snapshots are invisible; pre-table instants refuse") {
    val dir = s"${tmpDir()}/tbl"
    IcebergSource.commitAppend(spark, dir, nums(0, 10), 1L, 1000L)
    IcebergSource.commitAppend(spark, dir, nums(10, 30), 2L, 2000L)
    // a branch snapshot between the two main commits must NOT resolve
    IcebergSource.createBranch(dir, "dev", Some(1L), 2100L)
    IcebergSource.commitAppend(spark, dir, nums(100, 200), 31L, 2200L,
      toBranch = Some("dev"))
    IcebergSource.commitAppend(spark, dir, nums(30, 35), 3L, 3000L)
    assert(IcebergSource.readAsOf(spark, dir, 1000L).count() == 10) // exact instant
    assert(IcebergSource.readAsOf(spark, dir, 1500L).count() == 10)
    assert(IcebergSource.readAsOf(spark, dir, 2500L).count() == 30,
      "the 2200ms branch commit is not main history")
    assert(IcebergSource.readAsOf(spark, dir, 99999L).count() == 35)
    assert(intercept[graft.core.GraftError.Plan](
      IcebergSource.readAsOf(spark, dir, 999L)).getMessage.contains("no snapshot"))
    // expiry truncates travel but leaves the retained suffix navigable
    IcebergSource.dropRef(dir, "dev", 4000L)
    IcebergSource.expireSnapshots(dir, Set(2L, 3L), 5000L)
    assert(IcebergSource.readAsOf(spark, dir, 2500L).count() == 30)
    assert(intercept[graft.core.GraftError.Plan](
      IcebergSource.readAsOf(spark, dir, 1500L)).getMessage.contains("no snapshot"))
  }

  test("partition-spec evolution fuzz: three layout eras + random predicates " +
      "never lose a matching row to per-spec pruning") {
    import org.apache.spark.sql.{sources => sqs}
    val rnd = new scala.util.Random(1234)
    val dir = s"${tmpDir()}/evofuzz"
    // 3 eras of 150 rows each under three DIFFERENT specs over the
    // same columns: identity(tag) with ~5% nulls (the no-info token
    // path under evolution), truncate[1](tag) (interval rule), and
    // bucket[4](id) (hash equality rule)
    def rows(lo: Int, hi: Int) = (lo until hi).map { i =>
      val amt =
        if (rnd.nextInt(20) == 0) null
        else new java.math.BigDecimal((i % 4) * 1000 + rnd.nextInt(500)).setScale(2)
      val tag =
        if (rnd.nextInt(20) == 0) null
        else s"${('a' + rnd.nextInt(5)).toChar}${('a' + rnd.nextInt(3)).toChar}_$i"
      org.apache.spark.sql.Row(i.toLong, amt, tag)
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("amt", org.apache.spark.sql.types.DecimalType(12, 2)),
      org.apache.spark.sql.types.StructField("tag", org.apache.spark.sql.types.StringType)))
    def frame(lo: Int, hi: Int) = spark.createDataFrame(
      spark.sparkContext.parallelize(rows(lo, hi), 2), schema)
    IcebergSource.commitAppend(spark, dir, frame(0, 150), 1L, 1L,
      partitionBy = Seq("tag"))
    IcebergSource.commitAppend(spark, dir, frame(150, 300), 2L, 2L,
      partitionSpec = Seq(IcebergSource.PartField("tag_trunc", "tag", "truncate[1]")))
    IcebergSource.commitAppend(spark, dir, frame(300, 450), 3L, 3L,
      partitionSpec = Seq(IcebergSource.PartField("id_bucket", "id", "bucket[4]")))
    val meta = IcebergSource.readMeta(dir)
    assert(meta.specsById.keySet == Set(0L, 1L, 2L))
    val full = IcebergSource.read(spark, dir).persist()
    assert(full.count() == 450)
    val nAll = IcebergSource.dataFiles(dir).size
    var prunedAtLeastOnce = false
    (1 to 30).foreach { _ =>
      def basePred(): (sqs.Filter, org.apache.spark.sql.Column) = rnd.nextInt(8) match {
        case 0 =>
          val lit = new java.math.BigDecimal(rnd.nextInt(4000)).setScale(2)
          (sqs.LessThan("amt", lit): sqs.Filter, col("amt") < lit)
        case 1 =>
          val lit = new java.math.BigDecimal(rnd.nextInt(4000)).setScale(2)
          (sqs.GreaterThan("amt", lit): sqs.Filter, col("amt") > lit)
        case 2 =>
          val p = s"${('a' + rnd.nextInt(6)).toChar}"
          (sqs.StringStartsWith("tag", p): sqs.Filter, col("tag").startsWith(p))
        case 3 =>
          val p = s"${('a' + rnd.nextInt(5)).toChar}${('a' + rnd.nextInt(3)).toChar}_${rnd.nextInt(450)}"
          (sqs.EqualTo("tag", p): sqs.Filter, col("tag") === p)
        case 4 =>
          val v = rnd.nextInt(460).toLong
          (sqs.EqualTo("id", v): sqs.Filter, col("id") === v)
        case 5 =>
          val c = Seq("amt", "tag")(rnd.nextInt(2))
          (sqs.IsNull(c): sqs.Filter, col(c).isNull)
        case 6 =>
          val c = Seq("amt", "tag")(rnd.nextInt(2))
          (sqs.IsNotNull(c): sqs.Filter, col(c).isNotNull)
        case _ =>
          val v = rnd.nextInt(460).toLong
          (sqs.LessThan("id", v): sqs.Filter, col("id") < v)
      }
      val (f, rowPred) = rnd.nextInt(5) match {
        case 0 => basePred()
        case 1 => val (a, pa) = basePred(); (sqs.Not(a): sqs.Filter, !pa)
        case 2 =>
          val (a, pa) = basePred(); val (b, pb) = basePred()
          (sqs.And(a, b): sqs.Filter, pa && pb)
        case 3 =>
          val (a, pa) = basePred(); val (b, pb) = basePred()
          (sqs.Or(a, b): sqs.Filter, pa || pb)
        case _ =>
          val (a, pa) = basePred(); val (b, pb) = basePred()
          (sqs.Not(sqs.And(a, b)): sqs.Filter, !(pa && pb))
      }
      val expect = full.filter(rowPred).count()
      val planned = IcebergSource.dataFiles(dir, filters = Seq(f))
      if (planned.size < nAll) prunedAtLeastOnce = true
      val got = IcebergSource.read(spark, dir, filters = Seq(f)).filter(rowPred).count()
      assert(got == expect,
        s"evolved-spec pruning lost rows for $f: got $got expect $expect " +
          s"(planned ${planned.size}/$nAll)")
    }
    full.unpersist()
    assert(prunedAtLeastOnce, "fuzz must exercise at least one actual prune (non-vacuous)")
  }

  test("partition-spec evolution: same source under a different transform — " +
      "per-file spec resolution keeps transform pruning sound") {
    import org.apache.spark.sql.{sources => sqs}
    import spark.implicits._
    val dir = s"${tmpDir()}/tbl"
    val df1 = Seq((1L, "europe"), (2L, "usa")).toDF("id", "region")
    IcebergSource.commitAppend(spark, dir, df1, 1L, 1L, partitionBy = Seq("region"))
    // evolve: truncate[1] on the SAME source column, different field name
    val df2 = Seq((3L, "emea"), (4L, "uk")).toDF("id", "region")
    IcebergSource.commitAppend(spark, dir, df2, 2L, 2L,
      partitionSpec = Seq(IcebergSource.PartField("region_trunc", "region", "truncate[1]")))
    assert(IcebergSource.read(spark, dir).count() == 4)
    // region = 'emea': era-1 prunes by identity ('europe'/'usa' both
    // mismatch), era-2 prunes by the truncate interval rule ('u*' out)
    val fs = IcebergSource.dataFiles(dir, filters = Seq(sqs.EqualTo("region", "emea")))
    assert(fs.filter(_.specId == 0L).isEmpty, "identity-era files must prune exactly")
    assert(fs.filter(_.specId == 1L).forall(_.partition("region_trunc") == "e"),
      "truncate-era u-prefixed file must prune")
    assert(IcebergSource.read(spark, dir, filters = Seq(sqs.EqualTo("region", "emea")))
      .filter($"region" === "emea").select("id").as[Long].collect().toSet == Set(3L))
  }

  test("rewriteManifests: plan-time manifest opens drop to one per live spec; " +
      "reads, pruning, deletes, and incremental-window guards unchanged") {
    import org.apache.spark.sql.{sources => sqs}
    import spark.implicits._
    val dir = s"${tmpDir()}/rwm"
    // six appends under the identity spec = six manifests at plan time,
    // then a spec evolution (truncate[1] on tag) for a seventh
    (1 to 6).foreach { i =>
      IcebergSource.commitAppend(spark, dir, nums(i * 100, i * 100 + 50),
        i.toLong, i * 1000L)
    }
    IcebergSource.commitAppend(spark, dir, nums(700, 750), 7L, 7000L,
      partitionSpec = Seq(IcebergSource.PartField("tag_trunc", "tag", "truncate[1]")))
    // a row-level delete so a delete manifest must be carried by reference
    val del = spark.read.parquet(IcebergSource.dataFiles(dir).map(_.path): _*)
      .select(expr("_metadata.file_path").as("file_path"),
        expr("_metadata.row_index").as("pos"), col("id"))
      .filter($"id" % 100 === 0).select("file_path", "pos")
    IcebergSource.commitDeletes(spark, dir, posDeletes = Some(del),
      eqDeletes = None, snapshotId = 8L, timestampMs = 8000L)
    val manifestsBefore = IcebergSource.metaTable(spark, dir, "manifests")
    assert(manifestsBefore.filter($"content" === 0).count() == 7L,
      "one data manifest per append before the rewrite")
    // the table started unpartitioned, so the evolved truncate layout
    // reuses spec id 0 — the rewrite must still keep pre-evolution
    // files OUT of the spec's partition struct (no-info, not null-info)
    val beforeRows = IcebergSource.read(spark, dir)
      .select("id").as[Long].collect().sorted.toSeq

    IcebergSource.rewriteManifests(spark, dir, 9L, 9000L)

    // seven data manifests fold to TWO: the truncate-covered files
    // under the spec's struct, the pre-evolution files under a
    // no-partition-struct (no-info) manifest; the delete manifest
    // carries by reference with its ORIGINAL added_snapshot_id
    // (immutable file, incremental windows untouched)
    val manifestsAfter = IcebergSource.metaTable(spark, dir, "manifests").collect()
    assert(manifestsAfter.count(_.getAs[Int]("content") == 0) == 2,
      manifestsAfter.mkString(", "))
    assert(manifestsAfter.count(_.getAs[Int]("content") == 1) == 1)
    val afterRows = IcebergSource.read(spark, dir)
      .select("id").as[Long].collect().sorted.toSeq
    assert(afterRows == beforeRows, "a metadata-only rewrite must not change one row")

    // stats pruning unchanged: bounds were re-emitted on the EXISTING entries
    val pruned = IcebergSource.dataFiles(dir,
      filters = Seq(sqs.EqualTo("id", 120L)))
    assert(pruned.length == 1,
      s"id bounds must still prune to the one covering file: ${pruned.map(_.path)}")
    // the truncate-era files kept their partition values through the rewrite
    val truncEra = IcebergSource.dataFiles(dir)
      .filter(_.path.contains("snap-7"))
    assert(truncEra.nonEmpty &&
      truncEra.forall(_.partition.get("tag_trunc").contains("r")),
      truncEra.map(f => (f.path, f.partition)).toString)

    // the rewrite is a replace snapshot: incremental windows refuse to
    // cross it, exactly like compaction
    val err = intercept[graft.core.GraftError.Plan](
      IcebergSource.readIncremental(spark, dir, Some(6L), 9L))
    assert(err.getMessage.contains("replace"), err.getMessage)

    // life goes on: appends after the rewrite add exactly one manifest
    IcebergSource.commitAppend(spark, dir, nums(900, 950), 10L, 10000L)
    assert(IcebergSource.metaTable(spark, dir, "manifests")
      .filter($"content" === 0).count() == 3L)
    assert(IcebergSource.read(spark, dir).count() == beforeRows.length + 50L)
    assert(IcebergSource.readIncremental(spark, dir, Some(9L), 10L).count() == 50L)
  }

  test("metadata tables: snapshots/history/refs/files/delete_files/manifests/" +
      "partitions plan from metadata alone; unknown names refuse typed") {
    import spark.implicits._
    val dir = s"${tmpDir()}/tbl"
    IcebergSource.commitAppend(spark, dir, nums(0, 100).repartition(2), 1L, 1000L)
    IcebergSource.commitAppend(spark, dir, nums(100, 130).repartition(1), 2L, 2000L)
    IcebergSource.tagSnapshot(dir, "v1", 1L, 2500L)
    val del = spark.read.parquet(
        IcebergSource.dataFiles(dir).map(_.path): _*)
      .select(expr("_metadata.file_path").as("file_path"),
        expr("_metadata.row_index").as("pos"), col("id"))
      .filter($"id" % 10 === 0).select("file_path", "pos")
    IcebergSource.commitDeletes(spark, dir, posDeletes = Some(del),
      eqDeletes = None, snapshotId = 3L, timestampMs = 3000L)

    val snaps = IcebergSource.metaTable(spark, dir, "snapshots")
      .orderBy("snapshot_id").collect()
    assert(snaps.map(_.getAs[Long]("snapshot_id")).toSeq == Seq(1L, 2L, 3L))
    assert(snaps.map(_.getAs[String]("operation")).toSeq ==
      Seq("append", "append", "delete"))
    assert(snaps.map(_.getAs[Long]("committed_at_ms")).toSeq ==
      Seq(1000L, 2000L, 3000L))
    assert(snaps(1).getAs[Long]("parent_id") == 1L)

    val hist = IcebergSource.metaTable(spark, dir, "history")
    assert(hist.filter($"is_current_ancestor").count() == 3,
      "all three snapshots are main-lineage ancestors")

    val refs = IcebergSource.metaTable(spark, dir, "refs").collect()
      .map(r => r.getAs[String]("name") ->
        ((r.getAs[String]("type"), r.getAs[Long]("snapshot_id")))).toMap
    assert(refs("main") == (("branch", 3L)))
    assert(refs("v1") == (("tag", 1L)))
    // an EXPLICIT ref named 'main' suppresses the implicit head row —
    // never two conflicting 'main' rows in the refs table
    IcebergSource.createBranch(dir, "main", timestampMs = 3500L)
    val mainRows = IcebergSource.metaTable(spark, dir, "refs")
      .filter($"name" === "main").collect()
    assert(mainRows.length == 1, mainRows.mkString(", "))
    assert(mainRows(0).getAs[Long]("snapshot_id") == 3L)

    val files = IcebergSource.metaTable(spark, dir, "files")
    assert(files.count() == 3, "2 files from snapshot 1 + 1 from snapshot 2")
    assert(files.agg(sum("record_count")).head().getLong(0) == 130L,
      "files-table record counts sum to the pre-delete row count")
    // time travel: the files table at snapshot 1 sees only its 2 files
    assert(IcebergSource.metaTable(spark, dir, "files", Some(1L)).count() == 2)

    val dels = IcebergSource.metaTable(spark, dir, "delete_files").collect()
    assert(dels.nonEmpty && dels.forall(_.getAs[Int]("content") == 1),
      "position-delete files listed (one per write task)")
    assert(dels.forall(_.getAs[Long]("sequence_number") == 3L))

    val mans = IcebergSource.metaTable(spark, dir, "manifests")
    assert(mans.count() >= 2, "data + delete manifests listed")
    assert(mans.filter($"content" === 1).count() == 1)

    val parts = IcebergSource.metaTable(spark, dir, "partitions").collect()
    assert(parts.length == 1 && parts(0).getAs[String]("partition") == "",
      "unpartitioned table = one empty-tuple partition row")
    assert(parts(0).getAs[Long]("record_count") == 130L &&
      parts(0).getAs[Long]("file_count") == 3L)

    assert(intercept[graft.core.GraftError.Plan](
      IcebergSource.metaTable(spark, dir, "entries")).getMessage.contains("unknown metadata table"))
  }

  test("write-audit-publish: staged branch commits pin main, fast-forward publishes, divergence refuses") {
    val dir = s"${tmpDir()}/tbl"
    IcebergSource.commitAppend(spark, dir, nums(0, 40), snapshotId = 1L, timestampMs = 1L)
    IcebergSource.createBranch(dir, "wap", timestampMs = 2L)
    IcebergSource.commitAppend(spark, dir, nums(40, 70), snapshotId = 2L,
      timestampMs = 3L, toBranch = Some("wap"))
    // audit: main pinned, branch carries the staged rows
    assert(IcebergSource.read(spark, dir).count() == 40)
    assert(IcebergSource.readRef(spark, dir, "wap").count() == 70)
    // publish: ONE metadata version, no data/manifest churn
    val filesBefore = {
      val st = java.nio.file.Files.list(java.nio.file.Paths.get(dir, "data"))
      try { import scala.jdk.CollectionConverters._; st.iterator().asScala.size }
      finally st.close()
    }
    IcebergSource.fastForward(dir, "wap", timestampMs = 4L)
    assert(IcebergSource.read(spark, dir).count() == 70)
    val filesAfter = {
      val st = java.nio.file.Files.list(java.nio.file.Paths.get(dir, "data"))
      try { import scala.jdk.CollectionConverters._; st.iterator().asScala.size }
      finally st.close()
    }
    assert(filesBefore == filesAfter, "publish must be metadata-only")
    // idempotent republish is a no-op version-wise
    val v = IcebergSource.currentVersion(dir)
    IcebergSource.fastForward(dir, "wap", timestampMs = 5L)
    assert(IcebergSource.currentVersion(dir) == v)
    // divergence: a main commit beside a branch commit refuses the publish
    IcebergSource.createBranch(dir, "wap2", timestampMs = 6L)
    IcebergSource.commitAppend(spark, dir, nums(70, 80), snapshotId = 3L,
      timestampMs = 7L, toBranch = Some("wap2"))
    IcebergSource.commitAppend(spark, dir, nums(80, 90), snapshotId = 4L, timestampMs = 8L)
    val e = intercept[graft.core.GraftError.Plan](
      IcebergSource.fastForward(dir, "wap2", timestampMs = 9L))
    assert(e.getMessage.contains("not a fast-forward"))
  }
}
