package graft

import graft.pkg.Destinations
import graft.pkg.Destinations.Format

class DestinationsSpec extends SparkSpec {

  test("replace-by-swap: crash-safe overwrite, old table visible until rename") {
    val dir = tmpDir()
    val path = s"$dir/t"
    val v1 = graft.core.Tables(spark, sf(), "region")
    Destinations.replaceBySwap(v1, path, Format.Parquet)
    assert(spark.read.parquet(path).count() == v1.count())
    // second replace fully swaps content
    val v2 = v1.limit(2)
    Destinations.replaceBySwap(v2, path, Format.Parquet)
    assert(spark.read.parquet(path).count() == 2)
    // no leftover swap dir
    assert(!new java.io.File(s"$path.__swap").exists())
  }

  test("chaos: staged SQL MERGE survives a kill at every commit step; replay converges") {
    // The stage+MERGE commit path e2e against embedded Derby (the same
    // code drives Postgres by switching URL/driver; reference law:
    // cdf-dest-postgres/src/commit.rs:678-943 — one atomic destination
    // mutation, replay-idempotent from any crash point).
    import graft.sources.Jdbc
    import org.apache.spark.sql.functions.col
    val conn = Jdbc.Conn("jdbc:derby:memory:graftchaos;create=true")
    Jdbc.createTable(conn, "CREATE TABLE ACCTS (K BIGINT PRIMARY KEY, V VARCHAR(20))")
    import spark.implicits._
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("K", "V")
    Jdbc.append(base, conn, "ACCTS")
    val batch = Seq((2L, "B2"), (4L, "d")).toDF("K", "V") // update 2, insert 4

    final case class Kill(at: String) extends RuntimeException(at)
    def killAt(p: String): String => Unit = s => if (s == p) throw Kill(p)
    def state(): Seq[(Long, String)] =
      Jdbc.read(spark, conn, "ACCTS").collect()
        .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq

    // kill after the stage write: the destination is UNTOUCHED
    intercept[Kill](Jdbc.mergeInto(batch, conn, "ACCTS", "K", killAt("staged")))
    assert(state() == Seq((1L, "a"), (2L, "b"), (3L, "c")),
      "a crash before the MERGE must leave the destination untouched")
    // replay from that crash converges
    Jdbc.mergeInto(batch, conn, "ACCTS", "K")
    val merged = Seq((1L, "a"), (2L, "B2"), (3L, "c"), (4L, "d"))
    assert(state() == merged)

    // kill after the MERGE, before the stage drop: destination already
    // final; only the inert stage survives; replay is idempotent
    val batch2 = Seq((4L, "D2"), (5L, "e")).toDF("K", "V")
    intercept[Kill](Jdbc.mergeInto(batch2, conn, "ACCTS", "K", killAt("merged")))
    val afterMerge = Seq((1L, "a"), (2L, "B2"), (3L, "c"), (4L, "D2"), (5L, "e"))
    assert(state() == afterMerge, "the MERGE itself is the atomic commit point")
    assert(Jdbc.countProbe(conn, "ACCTS_STAGE") == 2, "stage survives the crash, inert")
    Jdbc.mergeInto(batch2, conn, "ACCTS", "K") // replay: overwrite stage, re-MERGE
    assert(state() == afterMerge, "replay after a post-commit crash must be a no-op upsert")
    // exact receipt: rows = priors + inserts, no duplicates ever
    assert(Jdbc.countProbe(conn, "ACCTS") == 5)
  }

  test("csv and ndjson destinations round-trip with verified receipts") {
    val dir = tmpDir()
    val df = graft.core.Tables(spark, sf(), "nation")
    val rCsv = Destinations.commitWithReceipt(df, s"$dir/n_csv", Format.Csv)
    assert(rCsv.rows == df.count())
    val rJson = Destinations.commitWithReceipt(df, s"$dir/n_json", Format.Ndjson)
    assert(rJson.rows == df.count())
    val rOrc = Destinations.commitWithReceipt(df, s"$dir/n_orc", Format.Orc)
    assert(rOrc.rows == df.count())
    assert(spark.read.orc(s"$dir/n_orc").except(df).count() == 0)
    // the probe re-read hashes the destination's own content
    assert(rJson.contentHash ==
      graft.pkg.PackageWriter.contentHash(spark.read.json(s"$dir/n_json")))
  }
}
