package graft.tools

object ScanProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local("32", "32")
    import org.apache.spark.sql.functions._
    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    def time(label: String)(body: => Unit): Unit = {
      body
      val walls = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      println(f"[scan-probe] $label%-34s ${walls.min}%.3f s")
    }
    // single-row-group original vs an 8-file rewrite of the same rows
    val dir8 = "/tmp/graft_scanprobe_li8"
    li.repartition(8).write.mode("overwrite").parquet(dir8)
    val li8 = spark.read.parquet(dir8)
    println(s"[scan-probe] li parts=${li.rdd.getNumPartitions} li8 parts=${li8.rdd.getNumPartitions}")
    time("li  sum(qty)") { li.agg(sum("l_quantity")).head() }
    time("li8 sum(qty)") { li8.agg(sum("l_quantity")).head() }
    time("li  3x countDistinct") { li.agg(countDistinct(col("l_orderkey")), countDistinct(col("l_partkey")), countDistinct(col("l_suppkey"))).head() }
    time("li8 3x countDistinct") { li8.agg(countDistinct(col("l_orderkey")), countDistinct(col("l_partkey")), countDistinct(col("l_suppkey"))).head() }
    val slice = li.select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    val slice8 = li8.select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    time("li  avro write+read+agg") {
      graft.sources.AvroSource.write(slice, "/tmp/graft_scanprobe_avro")
      graft.sources.AvroSource.read(spark, "/tmp/graft_scanprobe_avro/part-*.avro")
        .agg(count(lit(1))).head()
    }
    time("li8 avro write+read+agg") {
      graft.sources.AvroSource.write(slice8, "/tmp/graft_scanprobe_avro8")
      graft.sources.AvroSource.read(spark, "/tmp/graft_scanprobe_avro8/part-*.avro")
        .agg(count(lit(1))).head()
    }
    spark.stop()
  }
}
