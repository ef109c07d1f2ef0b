package graft.simd;

import jdk.incubator.vector.ByteVector;
import jdk.incubator.vector.DoubleVector;
import jdk.incubator.vector.IntVector;
import jdk.incubator.vector.LongVector;
import jdk.incubator.vector.VectorMask;
import jdk.incubator.vector.VectorOperators;
import jdk.incubator.vector.VectorSpecies;

/**
 * Explicit Vector API (jdk.incubator.vector) validation kernels — the
 * lanes where hand-written SIMD measurably BEATS what C2's SuperWord
 * pass generates for the branchless loops in {@link ByteKernels}.
 *
 * Measurement note (tools/SimdProbe, 4M rows, this host, JDK 17): the
 * first cut of this class carried explicit range kernels
 * (compare → trueCount → rank merge under mask). They won only on
 * uniform blocks (all-pass 0.74 ns/row) and LOST 3-5x on mixed
 * pass/fail blocks (5.1 vs 1.1 ns/row) because every route from a
 * data-lane mask to the byte-wide rank blend — VectorMask.fromLong,
 * cross-size mask cast, masked byte load/store — is un-intrinsified
 * software on JDK 17, while C2 auto-vectorizes the branchless
 * compare+cmov loops end to end. Those kernels were deleted: the
 * branchless {@link ByteKernels} loops ARE the SIMD range kernels here,
 * by construction of the JIT. What remains is the one shape where the
 * mask and the rank share a species, so the blend is a single native
 * instruction: the byte-lane NotNull kernel.
 *
 * Availability contract: incubator types appear only inside method
 * bodies (species are locals, no incubator types in any descriptor);
 * {@link #selfTest()} is the load-time probe — without
 * {@code --add-modules jdk.incubator.vector} it throws
 * {@code NoClassDefFoundError}, the caller records the reason and falls
 * back to {@link ByteKernels} with identical semantics.
 */
public final class SimdKernels {

  private SimdKernels() {}

  /** Exercises the Vector API; throws if the module is absent. */
  public static long selfTest() {
    long[] a = {1L, 2L, 3L, 4L};
    LongVector v = LongVector.fromArray(LongVector.SPECIES_128, a, 0);
    return v.reduceLanes(VectorOperators.ADD);
  }

  /** Human-readable lane configuration for artifact recording. */
  public static String laneInfo() {
    return "long=" + LongVector.SPECIES_PREFERRED.length()
        + " int=" + IntVector.SPECIES_PREFERRED.length()
        + " double=" + DoubleVector.SPECIES_PREFERRED.length()
        + " byte=" + ByteVector.SPECIES_PREFERRED.length();
  }

  /** lens[i] == 1 and offs[i] == offs[0] + i for all i &lt; n — the
   *  contiguous 1-byte-row layout every appended flag column has
   *  (single-char domains like returnflag/linestatus). When this holds,
   *  string rules collapse to pure byte-lane compares over the child
   *  store with NO per-row offset indirection. ~0.15 ns/row to verify,
   *  amortized by the ~10x faster kernel it unlocks. */
  public static boolean unitStrings(int[] offs, int[] lens, int n) {
    if (n <= 0) return false;
    VectorSpecies<Integer> sp = IntVector.SPECIES_PREFERRED;
    int lanes = sp.length();
    int off0 = offs[0];
    IntVector idx = IntVector.zero(sp).addIndex(1);
    int i = 0;
    int upper = sp.loopBound(n);
    for (; i < upper; i += lanes) {
      IntVector lv = IntVector.fromArray(sp, lens, i);
      if (!lv.compare(VectorOperators.EQ, 1).allTrue()) return false;
      IntVector ov = IntVector.fromArray(sp, offs, i);
      if (!ov.sub(idx).compare(VectorOperators.EQ, off0 + i).allTrue()) return false;
    }
    for (; i < n; i++) {
      if (lens[i] != 1 || offs[i] != off0 + i) return false;
    }
    return true;
  }

  /** Set membership over the contiguous 1-byte rows:
   *  child[base+i] ∈ {c0,c1,c2,c3} (callers pad unused slots with c0),
   *  one PASS BIT per row into bits (64 rows/word, tail zeroed).
   *  One 512-bit compare block per 64 rows; the mask leaves the vector
   *  domain through VectorMask.toLong.
   *
   *  Round-14 status: DEMOTED from the dispatch — the toLong bridge
   *  costs a flat ~1.48 ns/row regardless of candidate count
   *  (candidate-count-specialized variants measured identical), while
   *  the SWAR formulation in {@link ByteKernels#byteSet4ContigSwar}
   *  runs 0.28-0.38 ns/row with no module dependency. Kept as the
   *  vector-api reference point for tools/SimdProbe regressions. */
  public static long byteSetContigBits(byte[] child, int base, int n,
      byte c0, byte c1, byte c2, byte c3, byte[] nulls, long[] bits) {
    VectorSpecies<Byte> sp = ByteVector.SPECIES_PREFERRED;
    int lanes = sp.length();
    long passN = 0L;
    int i = 0;
    int upper = n & ~63;
    for (; i < upper; i += 64) {
      long word = 0L;
      for (int j = 0; j < 64; j += lanes) {
        ByteVector b = ByteVector.fromArray(sp, child, base + i + j);
        VectorMask<Byte> pass = b.compare(VectorOperators.EQ, c0)
            .or(b.compare(VectorOperators.EQ, c1))
            .or(b.compare(VectorOperators.EQ, c2))
            .or(b.compare(VectorOperators.EQ, c3));
        if (nulls != null) {
          pass = pass.and(ByteVector.fromArray(sp, nulls, i + j)
              .compare(VectorOperators.EQ, (byte) 0));
        }
        word |= pass.toLong() << j;
      }
      bits[i >> 6] = word;
      passN += Long.bitCount(word);
    }
    if (i < n) {
      long word = 0L;
      for (int k = i; k < n; k++) {
        byte b = child[base + k];
        boolean ok = (nulls == null || nulls[k] == 0)
            & (b == c0 | b == c1 | b == c2 | b == c3);
        word |= (ok ? 1L : 0L) << (k - i);
      }
      bits[i >> 6] = word;
      passN += Long.bitCount(word);
    }
    return passN;
  }
}
