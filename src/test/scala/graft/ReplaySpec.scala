package graft

import org.apache.spark.sql.functions._

import graft.core.Segmentation
import graft.pkg.PackageWriter
import graft.run.Replay

class ReplaySpec extends SparkSpec {

  test("package replay prunes by stats manifest, conservatively retains missing stats") {
    val base = tmpDir()
    val li = graft.core.Tables(spark, sf(), "lineitem")
    // three packages segmented by quantity range + one with no usable stats col
    PackageWriter.write(li.filter(col("l_quantity") <= 15), None, s"$base/p_low", "r", "h1")
    PackageWriter.write(li.filter(col("l_quantity") > 15 && col("l_quantity") <= 35), None, s"$base/p_mid", "r", "h2")
    PackageWriter.write(li.filter(col("l_quantity") > 35), None, s"$base/p_high", "r", "h3")
    PackageWriter.write(li.select("l_orderkey", "l_returnflag"), None, s"$base/p_nostat", "r", "h4")

    val dirs = Seq(s"$base/p_low", s"$base/p_mid", s"$base/p_high", s"$base/p_nostat")
    val (df, decisions) = Replay.replay(spark, dirs, "l_quantity", 40, 50)
    val byDir = decisions.map(d => d.dir.split('/').last -> d.outcome).toMap
    assert(byDir("p_low") == "pruned")
    assert(byDir("p_mid") == "pruned")
    assert(byDir("p_high") == "retained_may_match")
    assert(byDir("p_nostat") == "retained_conservatively")
    // correctness independent of pruning: equals direct filter on source
    val truth = li.filter(col("l_quantity").between(40, 50)).count()
    assert(df.count() == truth)
  }

  test("segmentation: planned from targets, recorded beside the package, outside identity") {
    import Segmentation._
    assert(plan(1000, 100) == 1)
    assert(plan(10L * 1024 * 1024, 10) == 3) // rows-bound: 10Mi/4Mi
    assert(plan(1024 * 1024, 1024) == 4) // bytes-bound: 1GiB/256MiB
    val dir = tmpDir()
    val li = graft.core.Tables(spark, sf(), "orders")
    val n = li.count()
    val (seg, rec) = segmented(li, n, approxRowBytes = 64,
      Targets(maxRowsPerSegment = 500, maxBytesPerSegment = 1L << 40))
    assert(rec.segments == math.ceil(n / 500.0).toInt)
    assert(seg.rdd.getNumPartitions == rec.segments)
    writeRecording(dir, rec)
    assert(readRecording(dir).contains(rec.segments))
    // identity invariance: package hash same with and without segmentation
    val h1 = PackageWriter.write(li, None, s"$dir/a", "r", "p").packageHash
    val h2 = PackageWriter.write(seg, None, s"$dir/b", "r", "p").packageHash
    assert(h1 == h2)
  }
}
