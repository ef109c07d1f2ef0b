package graft.tools

import java.util.Locale

/** Scale-rehearsal sweep with a COMMITTED artifact (r15 VERDICT item 7:
  * SCALE.md's exponents were builder-attested prose — the per-tier
  * numbers must be recomputable from committed JSON). Runs named
  * catalog cells against one staged tier (tools/ScaleStage output or
  * the shipped sf0.1) with QueryProbe methodology — one untimed warmup,
  * then `reps` timed noop-sink runs — and writes one JSON file:
  *
  *   {"tier":"x10","dir":...,"cpus":32,"cells":{"q_x":[min,med,max],...}}
  *
  * runMain graft.tools.ScaleSweep <tierDir> <label> <outJson> <reps> <q_a,q_b,...>
  */
object ScaleSweep {
  def main(args: Array[String]): Unit = {
    val Array(tierDir, label, outJson, repsStr, nameCsv) = args.take(5)
    val reps = repsStr.toInt
    val names = nameCsv.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.Sessions.local(cpus, cpus)
    def f(d: Double): String = String.format(Locale.ROOT, "%.2f", Double.box(d))
    val cells = names.flatMap { n =>
      val q = graft.catalog.Catalog.byName(n)
      val walls =
        try {
          q.run(spark, tierDir).write.format("noop").mode("overwrite").save() // warmup
          spark.catalog.clearCache(); graft.core.Scratch.reclaim()
          Some((1 to reps).map { _ =>
            val t0 = System.nanoTime()
            q.run(spark, tierDir).write.format("noop").mode("overwrite").save()
            val w = (System.nanoTime() - t0) / 1e9
            spark.catalog.clearCache(); graft.core.Scratch.reclaim()
            w
          }.sorted)
        } catch { case e: Throwable =>
          System.err.println(s"[scalesweep] $n failed: ${e.getMessage}"); None }
      walls.foreach(w => println(
        s"[scalesweep] $label $n min=${f(w.head)} med=${f(w(w.length / 2))} max=${f(w.last)}"))
      walls.map(w => n -> w)
    }
    val json = cells.map { case (n, w) =>
      "\"" + n + s"""\":[${f(w.head)},${f(w(w.length / 2))},${f(w.last)}]"""
    }.mkString(
      s"""{"tier":"$label","dir":"$tierDir","cpus":$cpus,"reps":$reps,"cells":{""",
      ",", "}}")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outJson), json + "\n")
    println(s"[scalesweep] wrote $outJson")
    spark.stop()
  }
}
