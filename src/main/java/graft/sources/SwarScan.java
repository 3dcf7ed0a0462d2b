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
}
