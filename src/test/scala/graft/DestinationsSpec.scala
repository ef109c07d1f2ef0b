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
