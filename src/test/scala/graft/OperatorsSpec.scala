package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators._

class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  private def keyedDf = Seq(
    ("k1", 1L, "a"), ("k1", 3L, "c"), ("k1", 2L, "b"),
    ("k2", 5L, "x")).toDF("k", "pos", "v")

  test("keyed dedup keep=First / keep=Last semantics") {
    val first = Dedup.keyed(keyedDf, Seq("k"), Seq("pos"), Dedup.Keep.First)
      .select("k", "v").as[(String, String)].collect().toMap
    assert(first == Map("k1" -> "a", "k2" -> "x"))
    val last = Dedup.keyed(keyedDf, Seq("k"), Seq("pos"), Dedup.Keep.Last)
      .select("k", "v").as[(String, String)].collect().toMap
    assert(last == Map("k1" -> "c", "k2" -> "x"))
  }

  test("keyed dedup keep=Fail exposes duplicate keys") {
    val counted = Dedup.keyed(keyedDf, Seq("k"), Seq("pos"), Dedup.Keep.Fail)
    assert(counted.filter(col("_graft_key_count") > 1).count() == 3) // all k1 rows
  }

  test("merge upsert: stage wins, base survives, idempotent") {
    val base = Seq((1L, "old1"), (2L, "old2"), (3L, "old3")).toDF("id", "v")
    val stage = Seq((2L, "new2"), (4L, "new4")).toDF("id", "v")
    val merged = MergeOps.upsert(base, stage, Seq("id"))
    val got = merged.as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "old1", 2L -> "new2", 3L -> "old3", 4L -> "new4"))
    // merging the same stage again changes nothing (idempotent)
    val again = MergeOps.upsert(merged, stage, Seq("id")).as[(Long, String)].collect().toMap
    assert(again == got)
  }

  test("cdc apply: last op per key wins; terminal delete removes") {
    val ops = Seq(
      (1L, 1L, "insert", "a"), (1L, 2L, "update", "b"),
      (2L, 1L, "insert", "x"), (2L, 2L, "delete", ""),
      (3L, 1L, "insert", "z")).toDF("id", "pos", "op", "v")
    val got = MergeOps.cdcApply(ops, Seq("id"), "op", Seq("pos"))
      .select("id", "v").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "b", 3L -> "z"))
  }

  test("late-data 3-way split is a partition of the input") {
    val wm = Timestamp.valueOf("2024-01-28 00:00:00")
    val df = graft.core.Tables.eventsTs(spark, sf())
    val (a, r, q) = LateData.split(df, "ts", wm, graceMs = 7L * 24 * 3600 * 1000)
    assert(a.count() + r.count() + q.count() == df.count())
    assert(a.intersect(r).count() == 0)
  }

  test("observe-based stats materialize as a by-product of the write, no second pass") {
    val li = graft.core.Tables(spark, sf(), "lineitem")
    val (observed, obs) = StatsOps.observed(li, Seq("l_quantity"))
    observed.write.format("noop").mode("overwrite").save() // the only action
    val m = obs.get
    assert(m("row_count") == li.count())
    assert(m("l_quantity__min") == 1.0 && m("l_quantity__max") == 50.0)
    assert(m("l_quantity__nulls") == 0L)
  }

  test("zstd-compressed parquet round-trips (columnar codec path)") {
    val dir = tmpDir()
    val df = graft.core.Tables(spark, sf(), "nation")
    df.write.option("compression", "zstd").parquet(s"$dir/z")
    val back = spark.read.parquet(s"$dir/z")
    assert(back.count() == df.count())
    assert(back.except(df).count() == 0)
    // the files really are zstd-compressed
    val f = new java.io.File(s"$dir/z").listFiles().find(_.getName.endsWith(".parquet")).get
    assert(f.getName.contains("zstd"))
  }

  test("segment pruning conservatively retains missing stats") {
    val stats = Seq(
      (0L, Some(1.0), Some(10.0)),
      (1L, Some(50.0), Some(60.0)),
      (2L, None: Option[Double], None: Option[Double]))
      .toDF("segment_id", "l_quantity__min", "l_quantity__max")
    val out = StatsOps.pruneSegments(stats, "l_quantity", 45, 55)
      .select("segment_id", "pruning_outcome").as[(Long, String)].collect().toMap
    assert(out == Map(0L -> "pruned", 1L -> "retained_may_match",
      2L -> "retained_conservatively"))
  }

  test("position merge algebra: cursors max, manifests union, mixed kinds rejected") {
    import graft.core.Position
    assert(Position.merge(Position.Cursor("ts", 10), Position.Cursor("ts", 20)) ==
      Position.Cursor("ts", 20))
    val m = Position.merge(
      Position.FileManifest(Seq(Position.FileEntry("a", 1, 1))),
      Position.FileManifest(Seq(Position.FileEntry("a", 2, 5), Position.FileEntry("b", 3, 2))))
    assert(m.asInstanceOf[Position.FileManifest].files.map(_.path) == Seq("a", "b"))
    intercept[IllegalArgumentException](
      Position.merge(Position.Cursor("ts", 1), Position.PageToken("x")))
  }

  test("position JSON round-trip") {
    import graft.core.Position
    val p: Position = Position.Cursor("updated_at", 1706572800000L)
    val j = graft.core.CanonicalJson.render(p.toJson)
    assert(Position.fromJson(j) == p)
  }
}
