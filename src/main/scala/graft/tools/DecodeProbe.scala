package graft.tools

import org.apache.spark.sql.functions.col

/** Attribution probe for the columnar-with-decode per-core cell
  * (prescription r13-4): stages the same one-split parquet file Bench
  * uses, then times ColumnarValidation.counts under varying
  * `spark.sql.parquet.columnarReaderBatchSize` and with the scan
  * narrowed to subsets of the gated columns — separating decode cost
  * per column family (numeric vs string vs date) from the kernel cost
  * the kernel-only cell already isolates. Driver-side diagnostics
  * only. */
object DecodeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.Sessions.local("32", "32")
    val policy = graft.catalog.CoreQueries.lineitemPolicy
    val repl = args.drop(1).headOption.map(_.toInt).getOrElse(1)
    val li0 = graft.core.Tables(spark, sfDir, "lineitem")
    val li = if (repl == 1) li0 else (1 to repl).map(_ => li0).reduce(_ unionAll _)
    // same staging as Bench's per-core cell: one file, one split
    val dir = java.nio.file.Files.createTempDirectory("decodeprobe").toString
    val coreDir = s"$dir/core_li"
    li.coalesce(1).write.parquet(coreDir)
    spark.conf.set("spark.sql.files.maxPartitionBytes", (4L << 30).toString)
    spark.conf.set("spark.sql.files.minPartitionNum", "1")

    def time(label: String)(work: => Unit): Unit = {
      work // warmup
      val walls = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); work; (System.nanoTime() - t0) / 1e9
      }
      println(f"[decode-probe] $label%-48s min=${walls.min}%.3fs med=${walls.sorted.apply(2)}%.3fs")
    }

    for (bs <- Seq(4096, 16384, 32768, 65536)) {
      spark.conf.set("spark.sql.parquet.columnarReaderBatchSize", bs.toString)
      val df = spark.read.parquet(coreDir)
      time(s"counts (5 gated cols) batchSize=$bs") {
        val r = graft.contract.ColumnarValidation.counts(df, policy)
        require(r.columnar, r.fallbackReason.getOrElse(""))
      }
    }
    spark.conf.set("spark.sql.parquet.columnarReaderBatchSize", "4096")
    val df = spark.read.parquet(coreDir)
    // decode-only floors: count() over column subsets via executeColumnar
    def decodeOnly(label: String, cols: Seq[String]): Unit = {
      val proj = df.select(cols.map(col): _*)
      time(s"decode-only [$label]") {
        val plan = proj.queryExecution.executedPlan
        val scan = plan.collectFirst {
          case s if s.supportsColumnar && s.children.isEmpty => s }.get
        val n = scan.executeColumnar().mapPartitions { it =>
          var rows = 0L
          it.foreach { b =>
            var c = 0
            while (c < b.numCols()) {
              // touch every value so lazy decode can't hide
              val v = b.column(c); var i = 0
              val dt = v.dataType()
              while (i < b.numRows()) {
                if (!v.isNullAt(i)) {
                  dt match {
                    case org.apache.spark.sql.types.StringType => v.getUTF8String(i)
                    case org.apache.spark.sql.types.LongType |
                         org.apache.spark.sql.types.TimestampType |
                         org.apache.spark.sql.types.TimestampNTZType => v.getLong(i)
                    case org.apache.spark.sql.types.DateType |
                         org.apache.spark.sql.types.IntegerType => v.getInt(i)
                    case dec: org.apache.spark.sql.types.DecimalType =>
                      v.getDecimal(i, dec.precision, dec.scale)
                    case _ => v.getDouble(i)
                  }
                }
                i += 1
              }
              c += 1
            }
            rows += b.numRows()
          }
          Iterator.single(rows)
        }.fold(0L)(_ + _)
        require(n > 0)
      }
    }
    decodeOnly("l_orderkey", Seq("l_orderkey"))
    decodeOnly("l_quantity", Seq("l_quantity"))
    decodeOnly("l_returnflag", Seq("l_returnflag"))
    decodeOnly("l_returnflag+l_linestatus", Seq("l_returnflag", "l_linestatus"))
    decodeOnly("l_shipdate", Seq("l_shipdate"))
    decodeOnly("all 5 gated", policy.rules.map(_.column).distinct)
    // does the reader hand us dictionary-backed vectors for the strings?
    val proj = df.select("l_returnflag")
    val plan = proj.queryExecution.executedPlan
    val scan = plan.collectFirst {
      case s if s.supportsColumnar && s.children.isEmpty => s }.get
    val dictInfo = scan.executeColumnar().mapPartitions { it =>
      if (!it.hasNext) Iterator.empty else {
      val b = it.next()
      val v = b.column(0)
      val oh = v match {
        case o: org.apache.spark.sql.execution.vectorized.OnHeapColumnVector =>
          s"onheap hasDict=${o.hasDictionary}"
        case other => other.getClass.getSimpleName
      }
      Iterator.single(oh)
      }
    }.collect().headOption.getOrElse("no batches")
    println(s"[decode-probe] l_returnflag first-batch vector: $dictInfo")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    spark.stop()
  }
}
