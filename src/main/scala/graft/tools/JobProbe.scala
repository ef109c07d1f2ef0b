package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

/** Per-job/stage timing probe for one catalog query (plan-shape work). */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, name) = args.take(2)
    val spark = graft.core.Sessions.local("32", "32")
    val starts = scala.collection.concurrent.TrieMap.empty[Int, Long]
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts(j.jobId) = j.time
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        lines.add(f"job ${j.jobId}%3d  ${(j.time - starts.getOrElse(j.jobId, j.time)) / 1000.0}%6.2fs")
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val ms = (for {a <- i.completionTime; b <- i.submissionTime} yield a - b).getOrElse(0L)
        lines.add(f"  stage ${i.stageId}%3d ${i.numTasks}%4d tasks ${ms / 1000.0}%6.2fs  ${i.name.takeWhile(_ != '\n').take(60)}")
      }
    })
    // one untimed warmup so codegen/JIT/broadcast-build cold costs do
    // not masquerade as plan costs; probed jobs are the WARM run's
    graft.SparkEntry.queries(name)(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    Thread.sleep(300)
    lines.clear()
    val t0 = System.nanoTime()
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    val n = df.collect().length
    val el = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    lines.forEach(l => println(s"[jobprobe] $l"))
    println(f"[jobprobe] TOTAL $name $el%.2fs rows=$n")
    spark.stop()
  }
}
