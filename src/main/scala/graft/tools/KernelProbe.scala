package graft.tools

import java.util.Locale

import graft.catalog.CoreQueries
import graft.contract.{ColumnarValidation, ContractPolicy}

/** Kernel microprobe: times each validation rule's columnar kernel in
  * isolation (and the full policy) over the decoded on-heap fixture —
  * attributing the kernel-only cell's wall to specific rules so
  * optimization follows measurement. Prints one JSON line of
  * ns-per-row per configuration. */
object KernelProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val spark = graft.core.Sessions.local("4", "4")
    val li1 = graft.core.Tables(spark, sfDir, "lineitem")
    val li = (1 to 8).map(_ => li1).reduce(_ unionAll _)
    val policy = CoreQueries.lineitemPolicy
    val cols = policy.rules.map(_.column).distinct
    val (batch, schema) = KernelFixture.onHeapBatch(li, cols)
    val n = batch.numRows().toLong

    def time(p: ContractPolicy): Double = {
      val (idxs, kerns, ranks) = ColumnarValidation.bindKernels(schema, p)
        .fold(r => sys.error(r), identity)
      def once(): Unit =
        ColumnarValidation.evalBatches(Iterator.single(batch), idxs, kerns, ranks)
      once(); once() // warmup
      val walls = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); once(); (System.nanoTime() - t0) / 1e9
      }
      walls.min * 1e9 / n // ns per row
    }

    println(s"[kernel-probe] lanes: ${graft.contract.FastLanes.describe}, " +
      s"reflective=${graft.contract.FastLanes.reflective}")
    val cells = policy.rules.map(r => r.id -> time(policy.copy(rules = Seq(r)))) :+
      ("all5" -> time(policy)) :+
      ("all5_scalar" -> {
        graft.contract.FastLanes.forceOff = true
        try time(policy) finally graft.contract.FastLanes.forceOff = false
      })
    def f(d: Double): String = String.format(Locale.ROOT, "%.2f", Double.box(d))
    println(cells.map { case (k, v) => s""""$k":${f(v)}""" }
      .mkString(s"""{"rows":$n,"unit":"ns_per_row",""", ",", "}"))
    spark.stop()
  }
}
