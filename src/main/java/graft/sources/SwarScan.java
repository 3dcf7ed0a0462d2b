package graft.sources;

import java.lang.invoke.MethodHandles;
import java.lang.invoke.VarHandle;
import java.nio.ByteOrder;

/**
 * SWAR (SIMD-within-a-register) byte search for the csv boundary scan: test
 * 8 bytes per iteration for "delimiter or escape" with the classic
 * {@code (x - 0x0101..) & ~x & 0x8080..} zero-byte trick. Java because the
 * {@link VarHandle} byte-array view is a signature-polymorphic intrinsic
 * only when invoked from Java — scalac routes the call through a boxing
 * bridge, which benchmarked 3-6x SLOWER than the plain byte loop
 * (graft.tools.MicroScan), while this shim compiles to one unaligned load
 * per 8 bytes.
 *
 * <p>The zero-byte mask can flag false positives in bytes ABOVE a true zero
 * (the subtraction borrows), never below — so the lowest flagged byte
 * (Long.numberOfTrailingZeros) is always a true match, and the caller
 * resumes the scan past the byte it consumed.
 */
public final class SwarScan {

  private static final VarHandle LV =
      MethodHandles.byteArrayViewVarHandle(long[].class, ByteOrder.LITTLE_ENDIAN);
  private static final long REP = 0x0101010101010101L;
  private static final long HIGH = 0x8080808080808080L;

  private SwarScan() {}

  /** {@code b} replicated into every byte of a long, for {@link #nextSpecial}. */
  public static long spread(byte b) {
    return REP * (b & 0xffL);
  }

  /**
   * Smallest index {@code j >= i} such that {@code bytes[j]} equals either
   * spread byte, as long as a full 8-byte word remains to test; otherwise
   * the start of the unaligned tail (callers single-step from there). Never
   * returns past {@code n}.
   */
  public static int nextSpecial(byte[] bytes, int i, int n, long dSpread, long eSpread) {
    while (i + 8 <= n) {
      long w = (long) LV.get(bytes, i);
      long x1 = w ^ dSpread;
      long x2 = w ^ eSpread;
      long m = (((x1 - REP) & ~x1) | ((x2 - REP) & ~x2)) & HIGH;
      if (m != 0) {
        return i + (Long.numberOfTrailingZeros(m) >>> 3);
      }
      i += 8;
    }
    return i;
  }

  /**
   * EXACT per-byte equality mask: bit 7 of byte k is set iff
   * {@code w}'s byte k equals the spread byte — no false positives, so
   * callers may iterate EVERY set bit (unlike the borrow-propagating
   * Mycroft mask above, where only the lowest bit is trustworthy).
   * {@code t = (x & 0x7f..) + 0x7f..} sets each byte's high bit iff the
   * low 7 bits are nonzero (the per-byte addition cannot carry across
   * byte lanes: both operands are ≤ 0x7f); OR-ing x itself covers the
   * high bit, so the complement's high bits mark exact zero bytes of x.
   */
  private static long eqMask(long w, long spread) {
    long x = w ^ spread;
    long t = (x & ~HIGH) + ~HIGH; // ~HIGH == 0x7f7f..7f
    return ~(t | x | ~HIGH) & HIGH;
  }

  /**
   * Field-boundary scan core for one csv line slice {@code [i, to)}:
   * records {@code starts[base + f] = pos + 1} for every unescaped
   * delimiter, f = fieldIdx..neededFields-1, consuming '\'-escapes
   * (escape skips the next byte). Returns the next unwritten field index.
   * Word loop: 8 bytes per iteration regardless of delimiter density —
   * words with NO escape byte iterate their exact delimiter mask
   * (JFR-measured: the per-delimiter {@link #nextSpecial} call pattern
   * dominated the sf5 scan profile at lineitem's ~5-byte field widths);
   * words containing an escape fall to the byte loop for that word only.
   */
  public static int scanFields(byte[] bytes, int i, int to, byte delim, byte esc,
                               int[] starts, int base, int neededFields, int fieldIdx) {
    return scanFields(bytes, i, to, delim, esc, starts, base, neededFields, fieldIdx, 1);
  }

  /**
   * Sparse variant: only fields {@code >= recordFrom} are stored — a
   * projection whose lowest referenced field is k never reads
   * {@code starts[base + 1..k-1]}, so a word whose delimiters all end
   * below-k fields advances by {@code Long.bitCount} of the exact mask:
   * a popcount instead of a per-delimiter bit loop and store (the
   * "delimiter-counting prefix skip"). Semantics of the returned field
   * counter, escapes, and the recorded slots are IDENTICAL to the dense
   * form with recordFrom = 1.
   */
  public static int scanFields(byte[] bytes, int i, int to, byte delim, byte esc,
                               int[] starts, int base, int neededFields, int fieldIdx,
                               int recordFrom) {
    int f = fieldIdx;
    final long dSpread = spread(delim);
    final long eSpread = spread(esc);
    while (f < neededFields && i + 8 <= to) {
      long w = (long) LV.get(bytes, i);
      long em = eqMask(w, eSpread);
      if (em == 0) {
        long dm = eqMask(w, dSpread);
        int bc = Long.bitCount(dm);
        if (f + bc <= recordFrom) {
          // every delimiter in this word ends a field below recordFrom
          // (largest stored index would be f + bc - 1 < recordFrom):
          // count, don't iterate
          f += bc;
          i += 8;
        } else {
          while (dm != 0) {
            if (f >= recordFrom)
              starts[base + f] = i + (Long.numberOfTrailingZeros(dm) >>> 3) + 1;
            f++;
            if (f >= neededFields) return f;
            dm &= dm - 1;
          }
          i += 8;
        }
      } else {
        int end = Math.min(i + 8, to);
        while (i < end && f < neededFields) {
          byte b = bytes[i];
          if (b == esc) i += 2;
          else {
            if (b == delim) { if (f >= recordFrom) starts[base + f] = i + 1; f++; }
            i += 1;
          }
        }
      }
    }
    while (i < to && f < neededFields) {
      byte b = bytes[i];
      if (b == esc) i += 2;
      else {
        if (b == delim) { if (f >= recordFrom) starts[base + f] = i + 1; f++; }
        i += 1;
      }
    }
    return f;
  }

  /**
   * Collect EVERY index of {@code target} in {@code bytes[from, n)}, in
   * ascending order, into {@code out[1..]}, storing the exclusive end of
   * the run in {@code out[0]} (so matches occupy {@code out[1 .. out[0])}).
   * Grows (and returns) the array as needed — callers must use the returned
   * reference. One word-at-a-time pass with the exact {@link #eqMask}
   * (every set bit is a true match) replaces a per-line
   * {@link #indexOf} restart: the block-level newline index costs one
   * streaming pass per block instead of per-line loop setup plus a
   * double-read of each line's boundary word.
   */
  public static int[] collect(byte[] bytes, int from, int n, byte target, int[] out) {
    final long spread = REP * (target & 0xffL);
    int c = 1;
    int i = from;
    while (i + 8 <= n) {
      if (c + 8 > out.length) out = java.util.Arrays.copyOf(out, out.length * 2);
      long w = (long) LV.get(bytes, i);
      long m = eqMask(w, spread);
      while (m != 0) {
        out[c++] = i + (Long.numberOfTrailingZeros(m) >>> 3);
        m &= m - 1;
      }
      i += 8;
    }
    if (c + 8 > out.length) out = java.util.Arrays.copyOf(out, out.length + 16);
    while (i < n) {
      if (bytes[i] == target) out[c++] = i;
      i++;
    }
    out[0] = c;
    return out;
  }

  /**
   * Exact index of the first {@code target} byte in {@code [i, n)}, or
   * {@code n} if absent — the newline scan of the line iterators (a
   * byte-per-iteration loop there cost ~2-3 CPU-s per 3 GB scanned). The
   * word loop stops at the first flagged word; the lowest flagged byte is a
   * true match (see class note), and the unaligned tail single-steps.
   */
  public static int indexOf(byte[] bytes, int i, int n, byte target) {
    final long spread = REP * (target & 0xffL);
    while (i + 8 <= n) {
      long x = ((long) LV.get(bytes, i)) ^ spread;
      long m = ((x - REP) & ~x) & HIGH;
      if (m != 0) {
        return i + (Long.numberOfTrailingZeros(m) >>> 3);
      }
      i += 8;
    }
    while (i < n && bytes[i] != target) i++;
    return i;
  }

  /**
   * Smallest index {@code j} in {@code [i, n)} with
   * {@code (bytes[j] & 0xff) >= limit} (1 &le; limit &le; 128), or -1 if
   * every byte is below the limit — the dict-code range validation of
   * {@code ColumnarBlocks.DictStream}, 8 codes per load (JFR r17: the
   * byte-per-iteration loop was most of DictStream construction at 9.6%
   * of the sf5 dict-columnar q1 scan profile).
   *
   * <p>Mask: a byte b &lt; 128 violates iff b + (128 - limit) has bit 7
   * set; a byte b &ge; 128 violates always and has bit 7 set in {@code w}
   * itself, so {@code (w | (w + add)) & HIGH} covers both. The per-byte
   * addition can carry INTO the next lane only out of a b &ge; 128 lane
   * (flagged anyway), and an incoming carry cannot wrap a b &lt; 128 lane
   * past 0xff (max 127 + 127 + 1), so violations are never masked — false
   * POSITIVES from the carry are possible, hence the flagged word is
   * re-checked byte-wise and the scan continues when it was spurious.
   */
  public static int firstByteAtLeast(byte[] bytes, int i, int n, int limit) {
    final long add = REP * (0x80L - limit);
    while (i + 8 <= n) {
      long w = (long) LV.get(bytes, i);
      if (((w | (w + add)) & HIGH) != 0) {
        for (int j = i; j < i + 8; j++) {
          if ((bytes[j] & 0xff) >= limit) return j;
        }
      }
      i += 8;
    }
    for (; i < n; i++) {
      if ((bytes[i] & 0xff) >= limit) return i;
    }
    return -1;
  }
}
