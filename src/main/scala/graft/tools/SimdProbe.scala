package graft.tools

import java.util.Locale

/** Micro-attribution for the fast kernel lanes: times the raw kernels
  * over synthetic primitive arrays (the ceiling), then the same shapes
  * through FastLanes over a real on-heap fixture vector (the integrated
  * cost), printing ns/row per cell. Pure driver-side diagnostics —
  * this probe is what demoted the explicit Vector API range kernels in
  * favor of the C2-auto-vectorized branchless loops (see the
  * SimdKernels scaladoc for the numbers). */
object SimdProbe {
  def main(args: Array[String]): Unit = {
    val n = 4 << 20
    def f(d: Double): String = String.format(Locale.ROOT, "%.3f", Double.box(d))
    def time(label: String, reps: Int = 7)(body: => Unit): Unit = {
      body; body // warmup
      val walls = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0).toDouble
      }
      println(s"[simd-probe] $label ${f(walls.min / n)} ns/row")
    }
    println(s"[simd-probe] ${graft.contract.FastLanes.describe}")

    val rnd = new java.util.Random(42)
    val longs = Array.fill(n)(rnd.nextLong() % 1000)
    val doubles = Array.fill(n)(rnd.nextDouble() * 60)
    val nulls = Array.fill(n)(if (rnd.nextInt(10) == 0) 1.toByte else 0.toByte)
    val rank = new Array[Byte](n)
    var sink = 0L

    time("geLong branchless (50% fail)") {
      sink += graft.simd.ByteKernels.geLong(longs, null, n, 0L, rank, 2)
    }
    time("geLong branchless (all fail)") {
      sink += graft.simd.ByteKernels.geLong(longs, null, n, Long.MaxValue, rank, 2)
    }
    time("rangeDouble branchless (75% pass)") {
      sink += graft.simd.ByteKernels.rangeDouble(doubles, null, n, 1.0, 45.0, rank, 2)
    }
    time("rangeDouble branchless + nulls") {
      sink += graft.simd.ByteKernels.rangeDouble(doubles, nulls, n, 1.0, 45.0, rank, 2)
    }
    time("notNull vector-api (10% null)") {
      sink += graft.simd.SimdKernels.notNull(nulls, n, rank, 2)
    }
    time("notNull branchless (10% null)") {
      sink += graft.simd.ByteKernels.notNull(nulls, n, rank, 2)
    }
    // string domain: 1-char strings like l_returnflag
    val offs = Array.tabulate(n)(identity)
    val lens = Array.fill(n)(1)
    val child = Array.tabulate(n)(i => "ANR".charAt(rnd.nextInt(3)).toByte)
    val cands = Array(Array('A'.toByte), Array('N'.toByte))
    time("domain bytes (2 cands, 1B)") {
      sink += graft.simd.ByteKernels.domain(offs, lens, child, null, n, cands, rank, 2)
    }
    time("startsWith bytes (1B prefix)") {
      sink += graft.simd.ByteKernels.startsWith(offs, lens, child, null, n,
        Array('A'.toByte), rank, 2)
    }
    // rank fold (the per-batch epilogue in evalBatches)
    val rowsByRank = new Array[Long](5)
    time("rank fold") {
      var i = 0
      while (i < n) { rowsByRank(rank(i)) += 1L; i += 1 }
    }

    // integrated: a real on-heap vector through FastLanes
    val spark = graft.core.Sessions.local("4", "4")
    import spark.implicits._
    val df = (0 until n).map(i => (longs(i), doubles(i))).toDF("l", "d")
    val (batch, _) = KernelFixture.onHeapBatch(df, Seq("l", "d"))
    val lVec = batch.column(0)
    val dVec = batch.column(1)
    time("FastLanes.geLong over fixture vector") {
      val got = graft.contract.FastLanes.geLong(lVec, n, 0L, rank, 2)
      require(got >= 0, "geLong lane did not engage")
      sink += got
    }
    time("FastLanes.rangeDouble over fixture vector") {
      val got = graft.contract.FastLanes.rangeDouble(dVec, n, 1.0, 45.0, rank, 2)
      require(got >= 0, "rangeDouble lane did not engage")
      sink += got
    }
    println(s"[simd-probe] sink=$sink")
    batch.close()
    spark.stop()
  }
}
