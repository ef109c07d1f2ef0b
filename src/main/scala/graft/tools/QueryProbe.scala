package graft.tools

import java.util.Locale

/** Local iteration aid: time named catalog queries in isolation
  * (min/med/max of N reps after one warmup) and optionally dump the
  * formatted plan — the per-query slice of Bench without its derived
  * cells, for plan-shape work between bench runs.
  *
  * runMain graft.tools.QueryProbe <sfDir> <q_a,q_b,...> [reps] [explain]
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.lift(1).map(_.split(",").map(_.trim).toSeq)
      .getOrElse(sys.error("usage: QueryProbe <sfDir> <q_a,q_b> [reps] [explain]"))
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val doExplain = args.lift(3).contains("explain")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.Sessions.local(cpus, cpus)
    def f(d: Double): String = String.format(Locale.ROOT, "%.2f", Double.box(d))
    names.foreach { n =>
      val q = graft.catalog.Catalog.byName(n)
      q.run(spark, sfDir).write.format("noop").mode("overwrite").save() // warmup
      spark.catalog.clearCache()
      val walls = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
        val w = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        graft.core.Scratch.reclaim() // mirror Bench's per-cell reclaim
        w
      }.sorted
      println(s"[probe] $n min=${f(walls.head)} med=${f(walls(walls.length / 2))} " +
        s"max=${f(walls.last)}")
      if (doExplain) q.run(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
