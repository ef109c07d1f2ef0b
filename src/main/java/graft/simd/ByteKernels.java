package graft.simd;

import java.util.Arrays;

/**
 * Primitive-array validation kernels that need NO incubator module:
 * direct loops over the decoded backing arrays of an
 * {@code OnHeapColumnVector} (obtained reflectively by the caller),
 * replacing per-element virtual {@code ColumnVector} getters. These are
 * (a) the fallback lane when {@code jdk.incubator.vector} is absent and
 * (b) the null-aware and string lanes the Vector API path delegates to.
 *
 * BRANCHLESS discipline: validation predicates over real data are
 * branch-prediction hostile (a domain rule failing 30% of rows at
 * random costs ~10ns/row in mispredicts alone — measured via
 * tools/SimdProbe, where the compare itself is ~1ns). Every loop here
 * therefore accumulates {@code passN += ok ? 1 : 0} and stores the rank
 * unconditionally through conditional moves:
 * {@code rank[i] = ok ? cur : max(cur, failRank)} — no data-dependent
 * branch anywhere on the row path.
 *
 * Contract (same as {@code ColumnarValidation.VecTest.run}): count
 * passing rows; for each failing row {@code i}, store {@code failRank}
 * into {@code rank[i]} when it exceeds the current value. {@code nulls}
 * may be null (meaning: no null in the batch); a null row fails every
 * rule here (NotNull has its own kernel).
 */
public final class ByteKernels {

  private ByteKernels() {}

  /** rank[i] = ok ? cur : max(cur, failRank), as straight-line code. */
  private static byte merge(byte cur, boolean ok, byte failRank) {
    byte failed = failRank > cur ? failRank : cur;
    return ok ? cur : failed;
  }

  // ------------------------------------------------------- numeric lanes

  public static long rangeLong(long[] data, byte[] nulls, int n,
      double lo, double hi, byte[] rank, byte failRank) {
    long passN = 0L;
    if (nulls == null) {
      for (int i = 0; i < n; i++) {
        double x = (double) data[i];
        boolean ok = x >= lo & x <= hi;
        passN += ok ? 1L : 0L;
        rank[i] = merge(rank[i], ok, failRank);
      }
    } else {
      for (int i = 0; i < n; i++) {
        double x = (double) data[i];
        boolean ok = nulls[i] == 0 & x >= lo & x <= hi;
        passN += ok ? 1L : 0L;
        rank[i] = merge(rank[i], ok, failRank);
      }
    }
    return passN;
  }

  public static long rangeInt(int[] data, byte[] nulls, int n,
      double lo, double hi, byte[] rank, byte failRank) {
    long passN = 0L;
    if (nulls == null) {
      for (int i = 0; i < n; i++) {
        double x = data[i];
        boolean ok = x >= lo & x <= hi;
        passN += ok ? 1L : 0L;
        rank[i] = merge(rank[i], ok, failRank);
      }
    } else {
      for (int i = 0; i < n; i++) {
        double x = data[i];
        boolean ok = nulls[i] == 0 & x >= lo & x <= hi;
        passN += ok ? 1L : 0L;
        rank[i] = merge(rank[i], ok, failRank);
      }
    }
    return passN;
  }

  public static long rangeShort(short[] data, byte[] nulls, int n,
      double lo, double hi, byte[] rank, byte failRank) {
    long passN = 0L;
    for (int i = 0; i < n; i++) {
      double x = data[i];
      boolean ok = (nulls == null || nulls[i] == 0) & x >= lo & x <= hi;
      passN += ok ? 1L : 0L;
      rank[i] = merge(rank[i], ok, failRank);
    }
    return passN;
  }

  public static long rangeByte(byte[] data, byte[] nulls, int n,
      double lo, double hi, byte[] rank, byte failRank) {
    long passN = 0L;
    for (int i = 0; i < n; i++) {
      double x = data[i];
      boolean ok = (nulls == null || nulls[i] == 0) & x >= lo & x <= hi;
      passN += ok ? 1L : 0L;
      rank[i] = merge(rank[i], ok, failRank);
    }
    return passN;
  }

  public static long rangeDouble(double[] data, byte[] nulls, int n,
      double lo, double hi, byte[] rank, byte failRank) {
    long passN = 0L;
    if (nulls == null) {
      for (int i = 0; i < n; i++) {
        double x = data[i];
        boolean ok = x >= lo & x <= hi;
        passN += ok ? 1L : 0L;
        rank[i] = merge(rank[i], ok, failRank);
      }
    } else {
      for (int i = 0; i < n; i++) {
        double x = data[i];
        boolean ok = nulls[i] == 0 & x >= lo & x <= hi;
        passN += ok ? 1L : 0L;
        rank[i] = merge(rank[i], ok, failRank);
      }
    }
    return passN;
  }

  public static long rangeFloat(float[] data, byte[] nulls, int n,
      double lo, double hi, byte[] rank, byte failRank) {
    long passN = 0L;
    for (int i = 0; i < n; i++) {
      double x = data[i];
      boolean ok = (nulls == null || nulls[i] == 0) & x >= lo & x <= hi;
      passN += ok ? 1L : 0L;
      rank[i] = merge(rank[i], ok, failRank);
    }
    return passN;
  }

  public static long geLong(long[] data, byte[] nulls, int n, long min,
      byte[] rank, byte failRank) {
    long passN = 0L;
    if (nulls == null) {
      for (int i = 0; i < n; i++) {
        boolean ok = data[i] >= min;
        passN += ok ? 1L : 0L;
        rank[i] = merge(rank[i], ok, failRank);
      }
    } else {
      for (int i = 0; i < n; i++) {
        boolean ok = nulls[i] == 0 & data[i] >= min;
        passN += ok ? 1L : 0L;
        rank[i] = merge(rank[i], ok, failRank);
      }
    }
    return passN;
  }

  public static long geInt(int[] data, byte[] nulls, int n, int min,
      byte[] rank, byte failRank) {
    long passN = 0L;
    if (nulls == null) {
      for (int i = 0; i < n; i++) {
        boolean ok = data[i] >= min;
        passN += ok ? 1L : 0L;
        rank[i] = merge(rank[i], ok, failRank);
      }
    } else {
      for (int i = 0; i < n; i++) {
        boolean ok = nulls[i] == 0 & data[i] >= min;
        passN += ok ? 1L : 0L;
        rank[i] = merge(rank[i], ok, failRank);
      }
    }
    return passN;
  }

  public static long notNull(byte[] nulls, int n, byte[] rank, byte failRank) {
    long passN = 0L;
    for (int i = 0; i < n; i++) {
      boolean ok = nulls[i] == 0;
      passN += ok ? 1L : 0L;
      rank[i] = merge(rank[i], ok, failRank);
    }
    return passN;
  }

  // -------------------------------------------------------- string lanes
  // offs/lens index the string column's (offset, length) pairs; child is
  // the contiguous UTF-8 byte store.

  /** Region equality. Validation literals are short (domain members,
   *  anchored-prefix rewrites — a few bytes), so short patterns compare
   *  inline without data-dependent early exits (the mismatch branch is
   *  the mispredict); only long patterns pay the vectorized-memcmp
   *  ({@link Arrays#equals(byte[], int, int, byte[], int, int)}). */
  private static boolean eq(byte[] child, int off, byte[] pat) {
    int pl = pat.length;
    if (pl > 32) return Arrays.equals(child, off, off + pl, pat, 0, pl);
    int diff = 0;
    for (int k = 0; k < pl; k++) {
      diff |= child[off + k] ^ pat[k];
    }
    return diff == 0;
  }

  public static long equalsLit(int[] offs, int[] lens, byte[] child,
      byte[] nulls, int n, byte[] pat, byte[] rank, byte failRank) {
    long passN = 0L;
    int pl = pat.length;
    if (pl == 1) {
      // 1-byte literal (the classic flag column): fully branch-free row
      byte p0 = pat[0];
      for (int i = 0; i < n; i++) {
        // && gates the child read: an empty row's offset may sit one
        // past the child store; the length test is prediction-friendly
        boolean ok = (nulls == null || nulls[i] == 0) & lens[i] == 1
            && child[offs[i]] == p0;
        passN += ok ? 1L : 0L;
        rank[i] = merge(rank[i], ok, failRank);
      }
      return passN;
    }
    for (int i = 0; i < n; i++) {
      // length gates the region read (safe: equal length implies the
      // row's own bytes), the boolean algebra stays branch-free
      boolean ok = (nulls == null || nulls[i] == 0) & lens[i] == pl
          && eq(child, offs[i], pat);
      passN += ok ? 1L : 0L;
      rank[i] = merge(rank[i], ok, failRank);
    }
    return passN;
  }

  public static long startsWith(int[] offs, int[] lens, byte[] child,
      byte[] nulls, int n, byte[] pat, byte[] rank, byte failRank) {
    long passN = 0L;
    int pl = pat.length;
    if (pl == 1) {
      byte p0 = pat[0];
      for (int i = 0; i < n; i++) {
        boolean ok = (nulls == null || nulls[i] == 0) & lens[i] >= 1
            && child[offs[i]] == p0;
        passN += ok ? 1L : 0L;
        rank[i] = merge(rank[i], ok, failRank);
      }
      return passN;
    }
    for (int i = 0; i < n; i++) {
      boolean ok = (nulls == null || nulls[i] == 0) & lens[i] >= pl
          && eq(child, offs[i], pat);
      passN += ok ? 1L : 0L;
      rank[i] = merge(rank[i], ok, failRank);
    }
    return passN;
  }

  public static long endsWith(int[] offs, int[] lens, byte[] child,
      byte[] nulls, int n, byte[] pat, byte[] rank, byte failRank) {
    long passN = 0L;
    int pl = pat.length;
    if (pl == 1) {
      byte p0 = pat[0];
      for (int i = 0; i < n; i++) {
        int len = lens[i];
        boolean ok = (nulls == null || nulls[i] == 0) & len >= 1
            && child[offs[i] + len - 1] == p0;
        passN += ok ? 1L : 0L;
        rank[i] = merge(rank[i], ok, failRank);
      }
      return passN;
    }
    for (int i = 0; i < n; i++) {
      boolean ok = (nulls == null || nulls[i] == 0) & lens[i] >= pl
          && eq(child, offs[i] + lens[i] - pl, pat);
      passN += ok ? 1L : 0L;
      rank[i] = merge(rank[i], ok, failRank);
    }
    return passN;
  }

  public static long containsLit(int[] offs, int[] lens, byte[] child,
      byte[] nulls, int n, byte[] pat, byte[] rank, byte failRank) {
    long passN = 0L;
    int pl = pat.length;
    for (int i = 0; i < n; i++) {
      boolean ok = nulls == null || nulls[i] == 0;
      if (ok && pl > 0) {
        ok = false;
        int start = offs[i];
        int last = offs[i] + lens[i] - pl;
        byte first = pat[0];
        for (int s = start; s <= last; s++) {
          if (child[s] == first && eq(child, s, pat)) {
            ok = true;
            break;
          }
        }
      }
      passN += ok ? 1L : 0L;
      rank[i] = merge(rank[i], ok, failRank);
    }
    return passN;
  }

  /** Allowed-set membership (tiny domains): OR-accumulated over the
   *  candidates — no early exit, no per-candidate mispredict. */
  public static long domain(int[] offs, int[] lens, byte[] child,
      byte[] nulls, int n, byte[][] candidates, byte[] rank, byte failRank) {
    long passN = 0L;
    int nc = candidates.length;
    for (int i = 0; i < n; i++) {
      int len = lens[i];
      int off = offs[i];
      boolean match = false;
      for (int c = 0; c < nc; c++) {
        byte[] cand = candidates[c];
        match |= cand.length == len && eq(child, off, cand);
      }
      boolean ok = (nulls == null || nulls[i] == 0) & match;
      passN += ok ? 1L : 0L;
      rank[i] = merge(rank[i], ok, failRank);
    }
    return passN;
  }
}
