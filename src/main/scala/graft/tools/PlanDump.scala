package graft.tools

/** Dump `.explain("formatted")` output for named catalog queries to
  * files (plans/<round>/<name>_{before,after}.txt — the optimization
  * rounds' evidence artifact). Explain-only: the query DataFrame is
  * built but not executed through a sink, so this is cheap for pure
  * batch plans (fixture-building queries still pay their fixture).
  *
  * runMain graft.tools.PlanDump <sfDir> <outDir> <suffix> <q_a,q_b,...>
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, suffix, nameCsv) = args.take(4)
    val names = nameCsv.split(",").map(_.trim).filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.Sessions.local(cpus, cpus)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { n =>
      val q = graft.catalog.Catalog.byName(n)
      try {
        val df = q.run(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(outDir, s"${n}_$suffix.txt"), plan)
        println(s"[plandump] wrote $outDir/${n}_$suffix.txt")
      } catch {
        case e: Throwable => System.err.println(s"[plandump] $n failed: ${e.getMessage}")
      } finally spark.catalog.clearCache()
    }
    spark.stop()
  }
}
