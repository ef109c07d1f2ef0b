package graft.tools

import org.apache.spark.sql.functions._

/** Plan evidence for q_shortest_paths' per-hop join (the BFS loop's
  * plans are not visible from the query's returned DataFrame — each
  * hop is localCheckpointed, which truncates lineage). Reconstructs
  * the hop-1 frame exactly as the catalog query builds it and dumps
  * the formatted plan in both shapes:
  *
  *   before — r15's forced broadcast(frontier) AND broadcast(settled)
  *            (the accumulating side collected to the driver per hop);
  *   after  — frontier-only broadcast behind the row-count gate,
  *            settled never hinted (r16; VERDICT r15 item 5).
  *
  * runMain graft.tools.BfsHopPlan <sfDir> <outDir>
  */
object BfsHopPlan {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = graft.core.Sessions.local(cpus, cpus)
    import s.implicits._
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val ev = graft.core.Tables.eventsUs(s, sfDir).select(
      col("user_id"), col("event_id"), col("ts_us"),
      get_json_object(col("props"), "$.k").cast("int").as("k"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts_us", "event_id")
    val p = ev
      .select(col("k").as("dst"), lag("k", 1).over(w).as("src"))
      .filter(col("src").isNotNull && col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .groupBy("u", "v").agg(count(lit(1)).as("c"))
      .persist()
    val nNodes = p.select(col("u").as("x")).union(p.select(col("v").as("x")))
      .distinct().count()
    val kept = p
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("c").desc, col("u"), col("v"))))
      .filter(col("rn") <= 2 * nNodes).select("u", "v")
    val adj = kept.select(col("u").as("a"), col("v").as("b"))
      .union(kept.select(col("v").as("a"), col("u").as("b")))
      .persist()
    val source = adj.agg(min("a")).head().getInt(0)
    val settled = Seq((source, 0)).toDF("node", "dist").localCheckpoint()
    val frontier = settled
    def hop(fr: org.apache.spark.sql.DataFrame,
        st: org.apache.spark.sql.DataFrame) = fr
      .join(adj, col("node") === col("a"))
      .select(col("b").as("node")).distinct()
      .join(st, Seq("node"), "left_anti")
      .withColumn("dist", lit(1))
    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, name), plan)
      println(s"[bfshopplan] wrote $outDir/$name")
    }
    dump("q_shortest_paths_before.txt",
      hop(broadcast(frontier), broadcast(settled)))
    dump("q_shortest_paths_after.txt",
      hop(broadcast(frontier), settled)) // gate holds at this scale
    s.stop()
  }
}
