package graft.format

import java.io.IOException

/** Column-group ("columnar") block layout for the typed csv payload — the
  * structural fix for the decompress-everything cost of a row-oriented
  * block: a projection of k of K columns decompresses only k sub-streams
  * instead of every column's bytes.
  *
  * Layout (opt-in at write time, `option("layout", "columnar")`): the
  * container envelope is UNCHANGED — header, block headers, EOS, stats /
  * bloom segments, footer are all byte-identical in structure to the row
  * layout (`/root/reference/4mc-format-spec:1-36`), so the footer index,
  * split alignment, zone maps, blooms and aggregate pushdown all work as
  * before. Only the meaning of one block's payload changes:
  *
  * {{{
  * payload = DIR | stream_0 | stream_1 | ... | stream_{K-1}
  * DIR     = per column c: storedLen(4) uncompressedLen(4) xxhash32(stored)(4)
  * stream_c = the column's values for every row of the block, each encoded
  *            exactly as the row layout encodes the field (same escaping,
  *            same `\N` null marker) and terminated by '\n'; compressed
  *            with the file codec, stored PLAIN when not strictly smaller
  *            (storedLen == uncompressedLen, the block-level convention
  *            applied per stream).
  * }}}
  *
  * The block header's `compressedSize` is the stored payload length
  * (DIR + streams) and `uncompressedSize` is DIR + Σ uncompressedLen —
  * both ≤ 4 MiB, so every structural bound of the classic reader holds.
  * The block checksum covers the stored payload like any other block, so
  * integrity walkers (fsck, `Tool -i`) verify columnar files unchanged;
  * selective readers that skip payload bytes verify the per-stream
  * checksums instead.
  *
  * Rows never span blocks (every block holds complete rows), which makes
  * split semantics trivial: a split owns the blocks whose headers start
  * inside it and emits exactly those blocks' rows — the same ownership rule
  * as the row layout with no first-line skip or spanning-line compensation.
  *
  * Detection: a columnar file always carries a stats segment written as
  * version 3, whose layout byte says "columnar" ([[BlockStats]]); readers
  * dispatch per FILE on that byte, so mixed directories read fine.
  */
object ColumnarBlocks {
  /** DIR entry: storedLen(4) uncompLen(4) xxhash32(4). */
  val DirEntryLen: Int = 12

  def dirLen(nCols: Int): Int = nCols * DirEntryLen

  @inline private[graft] def getBE(a: Array[Byte], off: Int): Int =
    ((a(off) & 0xff) << 24) | ((a(off + 1) & 0xff) << 16) |
      ((a(off + 2) & 0xff) << 8) | (a(off + 3) & 0xff)

  @inline private[graft] def putBE(a: Array[Byte], off: Int, v: Int): Unit = {
    a(off) = ((v >>> 24) & 0xff).toByte
    a(off + 1) = ((v >>> 16) & 0xff).toByte
    a(off + 2) = ((v >>> 8) & 0xff).toByte
    a(off + 3) = (v & 0xff).toByte
  }
}

/** Row-path adapter: presents a columnar file as an [[McLineStream]] by
  * SYNTHESIZING one delimited line per row — needed columns' stored bytes
  * (already escaped) at their field positions, every other field empty.
  * The csv row parser only ever slices the fields it projects, and empty
  * fields parse exactly like the row layout's missing trailing fields, so
  * the synthesized line is indistinguishable from a real one FOR THE
  * PROJECTION AT HAND. This keeps the non-vectorized reader (maps,
  * `_metadata`, vectorized=false) at one parse implementation; the
  * vectorized path reads the column streams directly and never pays the
  * synthesis copy.
  *
  * @param lineFields number of fields to emit per line (min(read-schema
  *   width, file width) — the parser's boundary scan is bounded by the read
  *   schema, so trailing file columns beyond it must not be emitted)
  */
final class McColumnarLineSynth(
    cursor: McColumnarCursor,
    lineFields: Int,
    needed: Array[Int],
    delim: Byte
) extends McLineStream {
  private var r = 0
  private var inBlock = false
  private var buf = new Array[Byte](256)

  var sliceOff: Long = 0L
  var sliceBytes: Array[Byte] = _
  var sliceStart: Int = 0
  var sliceEnd: Int = 0

  def advanceSlice(): Boolean = {
    while (!inBlock || r >= cursor.rows) {
      if (!cursor.nextBlock()) return false
      inBlock = true
      r = 0
    }
    var len = 0
    var j = 0 // pointer into needed
    var c = 0
    while (c < lineFields) {
      if (c > 0) {
        if (len + 1 > buf.length) buf = java.util.Arrays.copyOf(buf, buf.length * 2)
        buf(len) = delim
        len += 1
      }
      if (j < needed.length && needed(j) == c) {
        val s = cursor.valStart(j, r)
        val e = cursor.valEnd(j, r)
        val n = e - s
        while (len + n > buf.length) buf = java.util.Arrays.copyOf(buf, buf.length * 2)
        System.arraycopy(cursor.colBytes(j), s, buf, len, n)
        len += n
        j += 1
      }
      c += 1
    }
    sliceOff = cursor.blockOff
    sliceBytes = buf
    sliceStart = 0
    sliceEnd = len
    r += 1
    true
  }

  // detached-line Iterator interface (must not be mixed with slice mode)
  private var nextLine: (Long, Array[Byte]) = _
  private var primed = false
  override def hasNext: Boolean = {
    if (!primed) {
      nextLine =
        if (advanceSlice())
          (sliceOff, java.util.Arrays.copyOfRange(sliceBytes, sliceStart, sliceEnd))
        else null
      primed = true
    }
    nextLine != null
  }
  override def next(): (Long, Array[Byte]) = {
    if (!hasNext) throw new NoSuchElementException
    primed = false
    nextLine
  }
}

/** Split-scoped cursor over the owned blocks of one COLUMNAR csv file:
  * iterates blocks whose headers start in [splitStart, splitEnd), skipping
  * pruned ones, and decompresses ONLY the `needed` column streams of each.
  *
  * Per-row random access: `valStart(j, r)` / `valEnd(j, r)` give the byte
  * slice of row `r`'s value in needed-column `j` (0-based within `needed`),
  * resolved through a per-stream newline index — no boundary scan, no
  * delimiter walk, one field per line by construction.
  *
  * Corruption: strict mode throws on the first structural/checksum/codec
  * failure; permissive (`ignoreCorruptBlocks`) drops the whole block's rows
  * (counted in [[corruptSkipped]]) and resyncs to the next owned block —
  * block-granular loss, never duplication, because blocks are row-aligned.
  *
  * @param fileCols number of columns the FILE stores (the stats segment's
  *   column count — the DIR's entry count), which may exceed the read
  *   schema's width
  * @param needed   ascending file-column ordinals to decompress (< fileCols)
  * @param keep     per-block keep flags from stats/bloom pruning; null = all
  */
final class McColumnarCursor(
    in: McInput,
    index: FourMcIndex,
    fileCols: Int,
    needed: Array[Int],
    splitStart: Long,
    splitEnd: Long,
    keep: Array[Boolean],
    permissive: Boolean
) {
  import ColumnarBlocks._

  require(fileCols > 0 && fileCols <= 4096, s"columnar file column count $fileCols out of range")

  private val alignedStart = index.nextBlockAt(math.max(splitStart, FourMc.HeaderLen.toLong))
  private val alignedEnd =
    if (splitEnd >= index.eosPos) index.eosPos else index.nextBlockAt(splitEnd)
  private var ord = index.ordAt(alignedStart)
  private val endOrd = index.ordAt(alignedEnd) // exclusive

  /** Scan metrics, mirroring the row-layout iterators. */
  var blocksRead: Long = 0L
  var blocksSkipped: Long = 0L
  var corruptSkipped: Long = 0L

  /** Rows in the current block (valid after a true [[nextBlock]]). */
  var rows: Int = 0

  /** File offset of the current block's header. */
  var blockOff: Long = 0L

  /** File-wide ordinal of the current block (valid after a true
    * [[nextBlock]]) — lets the reader consult per-block side tables
    * (e.g. the certain-blocks predicate-elision mask).
    */
  var blockOrd: Int = -1

  private val colData = new Array[Array[Byte]](math.max(1, needed.length))
  private val colNl = new Array[Array[Int]](math.max(1, needed.length))
  // scratch reused across blocks
  private val hdr = new Array[Byte](FourMc.BlockHeaderLen)
  private val dir = new Array[Byte](dirLen(fileCols))
  private var ioBuf = new Array[Byte](0)

  def colBytes(j: Int): Array[Byte] = colData(j)

  /** Start of row `r`'s value in needed-column `j` (inclusive). */
  @inline def valStart(j: Int, r: Int): Int =
    if (r == 0) 0 else colNl(j)(r) + 1

  /** End of row `r`'s value in needed-column `j` (exclusive). */
  @inline def valEnd(j: Int, r: Int): Int = colNl(j)(r + 1)

  /** Advance to the next owned, kept, readable block; false when the split
    * is exhausted.
    */
  def nextBlock(): Boolean = {
    while (ord < endOrd) {
      val o = ord
      ord += 1
      if (keep != null && !keep(o)) blocksSkipped += 1
      else {
        try {
          readBlockCols(o)
          blocksRead += 1
          return true
        } catch {
          case e: IOException =>
            if (!permissive) throw e
            corruptSkipped += 1
        }
      }
    }
    false
  }

  private def readBlockCols(o: Int): Unit = {
    val off = index.blockOffsets(o)
    if (off >= index.eosPos) throw new IOException(s"4mc block $o starts past EOS")
    blockOff = off
    blockOrd = o
    in.readFully(off, hdr, 0, FourMc.BlockHeaderLen)
    val uncompLen = getBE(hdr, 0)
    val compLen = getBE(hdr, 4)
    val dl = dir.length
    if (uncompLen < dl || uncompLen > FourMc.MaxBlockSize)
      throw new IOException(s"4mc columnar block uncompressed size $uncompLen out of range at $off")
    if (compLen < dl || compLen > uncompLen)
      throw new IOException(s"4mc columnar block compressed size $compLen out of range at $off")
    in.readFully(off + FourMc.BlockHeaderLen, dir, 0, dl)
    // parse + validate the directory: stream offsets are cumulative
    val storedOff = new Array[Int](fileCols + 1)
    storedOff(0) = dl
    var totalUncomp = dl
    var c = 0
    while (c < fileCols) {
      val sLen = getBE(dir, c * DirEntryLen)
      val uLen = getBE(dir, c * DirEntryLen + 4)
      if (uLen < 0 || uLen > FourMc.MaxBlockSize)
        throw new IOException(s"4mc columnar stream $c uncompressed size $uLen out of range at $off")
      if (sLen < 0 || sLen > uLen)
        throw new IOException(s"4mc columnar stream $c stored size $sLen out of range at $off")
      storedOff(c + 1) = storedOff(c) + sLen
      totalUncomp += uLen
      c += 1
    }
    if (storedOff(fileCols) != compLen)
      throw new IOException(
        s"4mc columnar directory disagrees with block size (${storedOff(fileCols)} vs $compLen) at $off")
    if (totalUncomp != uncompLen)
      throw new IOException(
        s"4mc columnar directory disagrees with uncompressed size ($totalUncomp vs $uncompLen) at $off")
    // an empty projection still needs the row count: count newlines of the
    // smallest stream (stats lineCount is the planner's number; the data
    // itself stays the source of truth on the read path)
    val cols: Array[Int] =
      if (needed.nonEmpty) needed
      else {
        var best = 0
        var c2 = 1
        while (c2 < fileCols) {
          if (getBE(dir, c2 * DirEntryLen + 4) < getBE(dir, best * DirEntryLen + 4)) best = c2
          c2 += 1
        }
        Array(best)
      }
    // coalesced positional reads: adjacent needed streams (gap ≤ 64 KiB)
    // share one readFully — selective I/O without a seek per column
    val MaxGap = 64 * 1024
    var j = 0
    var rowsSeen = -1
    while (j < cols.length) {
      var k = j
      while (k + 1 < cols.length &&
        storedOff(cols(k + 1)) - storedOff(cols(k) + 1) <= MaxGap) k += 1
      val lo = storedOff(cols(j))
      val hi = storedOff(cols(k) + 1)
      val len = hi - lo
      if (ioBuf.length < len) ioBuf = new Array[Byte](len)
      in.readFully(off + FourMc.BlockHeaderLen + lo, ioBuf, 0, len)
      var m = j
      while (m <= k) {
        val col = cols(m)
        val sLen = storedOff(col + 1) - storedOff(col)
        val uLen = getBE(dir, col * DirEntryLen + 4)
        val want = getBE(dir, col * DirEntryLen + 8)
        val bOff = storedOff(col) - lo
        if (FourMc.xxhash32(ioBuf, bOff, sLen) != want)
          throw new IOException(s"4mc columnar stream $col checksum mismatch at $off")
        val data =
          if (sLen == uLen) java.util.Arrays.copyOfRange(ioBuf, bOff, bOff + uLen)
          else McCodec.decompress(index.zstd, ioBuf, bOff, sLen, uLen)
        if (uLen > 0 && data(uLen - 1) != '\n')
          throw new IOException(s"4mc columnar stream $col not newline-terminated at $off")
        val slot = if (needed.isEmpty) 0 else m
        colData(slot) = data
        colNl(slot) = graft.sources.SwarScan.collect(
          data, 0, uLen, '\n'.toByte, if (colNl(slot) == null) new Array[Int](4096) else colNl(slot))
        val r = colNl(slot)(0) - 1
        if (rowsSeen < 0) rowsSeen = r
        else if (rowsSeen != r)
          throw new IOException(
            s"4mc columnar streams disagree on row count ($rowsSeen vs $r) at $off")
        m += 1
      }
      j = k + 1
    }
    rows = math.max(rowsSeen, 0)
  }
}
