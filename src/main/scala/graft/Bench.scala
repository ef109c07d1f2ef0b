package graft

import java.util.Locale

/** Benchmark main: runs every catalog query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric","value","unit","queries","sf"}.
  *
  * Each query is forced through the `noop` sink so the full plan
  * materializes (a bare count() would let Catalyst prune the very
  * work being measured). One untimed warmup of a small query pays the
  * JIT/codegen cost once.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.Sessions.local(cpus, cpus)

    // warmup: session + codegen + parquet footer caches
    SparkEntry.queries("q1_agg")(spark, sfDir).write
      .format("noop").mode("overwrite").save()

    val results = graft.catalog.Catalog.all.map { q =>
      val t0 = System.nanoTime()
      val ok =
        try { q.run(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}"); false }
      val sec = (System.nanoTime() - t0) / 1e9
      q.name -> (if (ok) sec else -1.0)
    }

    def f(d: Double): String = String.format(Locale.ROOT, "%.4f", Double.box(d))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f(v) }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    println(s"""{"metric":"total","value":${f(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
