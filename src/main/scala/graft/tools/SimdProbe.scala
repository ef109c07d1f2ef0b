package graft.tools

import java.util.Locale

/** Micro-attribution for the fast kernel lanes: times the raw BITSET
  * kernels over synthetic primitive arrays (the ceiling), then the same
  * shapes through FastLanes over a real on-heap fixture vector (the
  * integrated cost), printing ns/row per cell. Pure driver-side
  * diagnostics — the probe lineage that first demoted the explicit
  * Vector API range kernels for C2's branchless loops (r12), then
  * demoted the byte-rank formulation itself for pass-bit words (r13:
  * geLong 6.4 → 0.9 ns/row; the verdict join is popcount algebra). */
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
    val bits = new Array[Long]((n + 63) >> 6)
    var sink = 0L

    time("geLongBits (50% fail)") {
      sink += graft.simd.ByteKernels.geLongBits(longs, null, n, 0L, bits)
    }
    time("geLongBits (all fail)") {
      sink += graft.simd.ByteKernels.geLongBits(longs, null, n, Long.MaxValue, bits)
    }
    time("rangeDoubleBits (75% pass)") {
      sink += graft.simd.ByteKernels.rangeDoubleBits(doubles, null, n, 1.0, 45.0, bits)
    }
    time("rangeDoubleBits + nulls") {
      sink += graft.simd.ByteKernels.rangeDoubleBits(doubles, nulls, n, 1.0, 45.0, bits)
    }
    time("notNullBits (10% null)") {
      sink += graft.simd.ByteKernels.notNullBits(nulls, n, bits)
    }
    // string domain: 1-char strings like l_returnflag
    val offs = Array.tabulate(n)(identity)
    val lens = Array.fill(n)(1)
    val child = Array.tabulate(n)(_ => "ANR".charAt(rnd.nextInt(3)).toByte)
    val cands = Array(Array('A'.toByte), Array('N'.toByte))
    time("domainBits (2 cands, 1B)") {
      sink += graft.simd.ByteKernels.domainBits(offs, lens, child, null, n, cands, bits)
    }
    time("byteSetContigBits vector-api") {
      sink += graft.simd.SimdKernels.byteSetContigBits(child, 0, n,
        'A'.toByte, 'N'.toByte, 'A'.toByte, 'A'.toByte, null, bits)
    }
    time("byteEqContigSwar") {
      sink += graft.simd.ByteKernels.byteEqContigSwar(child, 0, n,
        'A'.toByte, null, bits)
    }
    time("byteSet2ContigSwar") {
      sink += graft.simd.ByteKernels.byteSet2ContigSwar(child, 0, n,
        'A'.toByte, 'N'.toByte, null, bits)
    }
    time("byteSet4ContigSwar") {
      sink += graft.simd.ByteKernels.byteSet4ContigSwar(child, 0, n,
        'A'.toByte, 'N'.toByte, 'A'.toByte, 'A'.toByte, null, bits)
    }
    time("byteSet2ContigSwar + nulls") {
      sink += graft.simd.ByteKernels.byteSet2ContigSwar(child, 0, n,
        'A'.toByte, 'N'.toByte, nulls, bits)
    }
    time("startsWithBits (1B prefix)") {
      sink += graft.simd.ByteKernels.startsWithBits(offs, lens, child, null, n,
        Array('A'.toByte), bits)
    }
    // verdict join (the per-batch epilogue in evalBatches): word algebra
    val bits2 = new Array[Long](bits.length)
    graft.simd.ByteKernels.geLongBits(longs, null, n, 0L, bits2)
    val rowsByRank = new Array[Long](5)
    time("verdict join (2 rules, popcnt)") {
      var w = 0
      val full = n >> 6
      while (w < full) {
        val fail = ~(bits(w) & bits2(w))
        rowsByRank(3) += java.lang.Long.bitCount(fail)
        w += 1
      }
    }

    // integrated: a real on-heap vector through FastLanes
    val spark = graft.core.Sessions.local("4", "4")
    import spark.implicits._
    val df = (0 until n).map(i => (longs(i), doubles(i))).toDF("l", "d")
    val (batch, _) = KernelFixture.onHeapBatch(df, Seq("l", "d"))
    val lVec = batch.column(0)
    val dVec = batch.column(1)
    time("FastLanes.geLongBits over fixture vector") {
      val got = graft.contract.FastLanes.geLongBits(lVec, n, 0L, bits)
      require(got >= 0, "geLongBits lane did not engage")
      sink += got
    }
    time("FastLanes.rangeDoubleBits over fixture vector") {
      val got = graft.contract.FastLanes.rangeDoubleBits(dVec, n, 1.0, 45.0, bits)
      require(got >= 0, "rangeDoubleBits lane did not engage")
      sink += got
    }
    println(s"[simd-probe] sink=$sink")
    batch.close()
    spark.stop()
  }
}
