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
}
