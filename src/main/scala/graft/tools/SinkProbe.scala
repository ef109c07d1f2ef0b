package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Isolates the parquet-sink bench cell (VERDICT r13 item 4: 8.2M →
  * 7.2M rows/s between the r12 and r13 artifacts): stages the same
  * 8×-replicated 32-split lineitem table Bench uses, then times
  * `li.write.parquet` with a per-stage listener so scan-vs-write wall
  * attribution is direct. Also times a scan→noop pass (the read side
  * alone) and a rows-only in-memory write (the encode side alone over
  * a cached projection) so a regression pins to decode, encode, or
  * the filesystem. */
object SinkProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.Sessions.local("32", "32")
    // honors SPARK_GRAFT_SCRATCH so the shm-vs-disk question stays A/B-able
    val sinkDir =
      java.nio.file.Files.createTempDirectory(graft.core.Scratch.root, "graft_sinkprobe").toString
    val stageWalls = new java.util.concurrent.ConcurrentLinkedQueue[(String, Double)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val ms = (for { a <- i.completionTime; b <- i.submissionTime } yield a - b).getOrElse(0L)
        stageWalls.add((i.name.takeWhile(_ != '\n').take(40), ms / 1000.0))
      }
    })
    val li1 = graft.core.Tables(spark, sfDir, "lineitem")
    val liRows = li1.count() * 8
    val stagedDir = s"$sinkDir/staged_li"
    (1 to 8).map(_ => li1).reduce(_ unionAll _)
      .repartition(32).write.parquet(stagedDir)
    val li = spark.read.parquet(stagedDir)

    def cell(label: String)(body: Int => Unit): Unit = {
      body(99) // warmup
      val walls = (1 to 6).map { i =>
        val t0 = System.nanoTime(); body(i); (System.nanoTime() - t0) / 1e9
      }
      val rps = walls.map(w => liRows / w / 1e6)
      println(f"[sinkprobe] $label%-18s min=${rps.min}%5.1fM med=${rps.sorted.apply(3)}%5.1fM max=${rps.max}%5.1fM rows/s  (walls ${walls.map(w => f"$w%.2f").mkString(",")})")
    }
    cell("scan->noop") { _ => li.write.format("noop").mode("overwrite").save() }
    cell("parquet sink") { i => li.write.parquet(s"$sinkDir/li_$i") }
    // encode-only: same rows from an in-memory cache, no parquet decode upstream
    val cached = li.cache()
    cached.count()
    cell("cache->parquet") { i => cached.write.parquet(s"$sinkDir/lic_$i") }
    cached.unpersist()
    Thread.sleep(300)
    val byName = new scala.collection.mutable.LinkedHashMap[String, (Int, Double)]()
    stageWalls.forEach { case (n, w) =>
      val (c, s) = byName.getOrElse(n, (0, 0.0)); byName(n) = (c + 1, s + w)
    }
    byName.foreach { case (n, (c, s)) => println(f"[sinkprobe] stage '$n' x$c total=$s%.2fs") }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(sinkDir))
    spark.stop()
  }
}
