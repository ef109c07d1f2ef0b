package graft.tools

import java.util.Locale

/** QueryProbe with session confs applied first — A/B any runtime conf
  * against named catalog cells without touching query code.
  *
  * runMain graft.tools.ConfProbe <sfDir> <q_a,q_b> <reps> [k=v k=v ...]
  */
object ConfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").map(_.trim).toSeq
    val reps = args(2).toInt
    val confs = args.drop(3).toSeq.filter(_.contains("="))
      .map { kv => val Array(k, v) = kv.split("=", 2); (k, v) }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.Sessions.local(cpus, cpus)
    confs.foreach { case (k, v) => spark.conf.set(k, v); println(s"[confprobe] $k=$v") }
    def f(d: Double): String = String.format(Locale.ROOT, "%.2f", Double.box(d))
    names.foreach { n =>
      val q = graft.catalog.Catalog.byName(n)
      q.run(spark, sfDir).write.format("noop").mode("overwrite").save() // warmup
      spark.catalog.clearCache()
      graft.core.Scratch.reclaim()
      val walls = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
        val w = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        graft.core.Scratch.reclaim()
        w
      }.sorted
      println(s"[confprobe] $n min=${f(walls.head)} med=${f(walls(walls.length / 2))} " +
        s"max=${f(walls.last)}")
    }
    spark.stop()
  }
}
