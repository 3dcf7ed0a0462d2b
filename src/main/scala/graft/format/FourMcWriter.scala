package graft.format

import java.io.OutputStream

/** Streaming 4mc/4mz writer: buffers up to 4 MiB, emits one container block
  * per flush with store-plain fallback, and writes EOS + the delta-encoded
  * footer index on close.
  *
  * Behavioral contract from the reference writer
  * (`FourMcOutputStream.java:69-223`): block offsets are absolute file
  * positions of each block header (first = 12); a block whose compressed form
  * is not strictly smaller is stored plain; EOS is 12 zero bytes; footer is
  * size|version|deltas|size|magic|xxhash32(preceding footer bytes).
  */
/** @param blockBytes flush threshold (≤ [[FourMc.MaxBlockSize]], the format
  *   MAXIMUM — smaller blocks are spec-compliant and read-compatible).
  *   Smaller blocks trade a little ratio/overhead for FINER zone-map
  *   granularity: a sorted file pruned against [[BlockStats]] skips at
  *   block resolution, so 1 MiB blocks decode ~4× less surviving data at
  *   the range edges than 4 MiB ones.
  */
final class FourMcWriter(out: OutputStream, codec: McCodec,
                         blockBytes: Int = FourMc.MaxBlockSize) extends OutputStream {
  require(blockBytes > 0 && blockBytes <= FourMc.MaxBlockSize,
    s"blockBytes must be in (0, ${FourMc.MaxBlockSize}], got $blockBytes")
  private val buf = new Array[Byte](blockBytes)
  private var bufLen = 0
  private var bytesOut = 0L
  private val blockOffsets = scala.collection.mutable.ArrayBuffer.empty[Long]
  private var closed = false
  private var finished = false

  /** Optional stats-segment provider (block count → serialized segment),
    * written between EOS and the footer ([[BlockStats]]). Null = no segment;
    * the footer stays byte-identical either way.
    */
  var statsProvider: Int => Array[Byte] = null

  /** Optional bloom-segment provider ([[BlockBlooms]]), written between EOS
    * and the stats segment. Only meaningful alongside a stats segment — the
    * reader's detection chain walks footer → stats → bloom.
    */
  var bloomProvider: Int => Array[Byte] = null

  writeHeader()

  private def writeInt(v: Int): Unit = {
    out.write((v >>> 24) & 0xff)
    out.write((v >>> 16) & 0xff)
    out.write((v >>> 8) & 0xff)
    out.write(v & 0xff)
    bytesOut += 4
  }

  private def writeHeader(): Unit = {
    val hdr = new Array[Byte](8)
    putBE(hdr, 0, codec.magic)
    putBE(hdr, 4, FourMc.Version)
    out.write(hdr)
    bytesOut += 8
    writeInt(FourMc.xxhash32(hdr, 0, 8))
  }

  private def putBE(a: Array[Byte], off: Int, v: Int): Unit = {
    a(off) = ((v >>> 24) & 0xff).toByte
    a(off + 1) = ((v >>> 16) & 0xff).toByte
    a(off + 2) = ((v >>> 8) & 0xff).toByte
    a(off + 3) = (v & 0xff).toByte
  }

  override def write(b: Int): Unit = write(Array(b.toByte), 0, 1)

  override def write(b: Array[Byte], off0: Int, len0: Int): Unit = {
    var off = off0
    var len = len0
    while (len > 0) {
      val n = math.min(len, blockBytes - bufLen)
      System.arraycopy(b, off, buf, bufLen, n)
      bufLen += n
      off += n
      len -= n
      if (bufLen == blockBytes) flushBlock()
    }
  }

  /** Flush the current buffer as one container block (no-op when empty). */
  def flushBlock(): Unit = if (bufLen > 0) {
    blockOffsets += bytesOut
    val compressed = codec.compress(buf, bufLen)
    writeInt(bufLen)
    if (compressed == null) { // store plain: compressedSize == uncompressedSize
      writeInt(bufLen)
      writeInt(FourMc.xxhash32(buf, 0, bufLen))
      out.write(buf, 0, bufLen)
      bytesOut += bufLen
    } else {
      writeInt(compressed.length)
      writeInt(FourMc.xxhash32(compressed, 0, compressed.length))
      out.write(compressed)
      bytesOut += compressed.length
    }
    bufLen = 0
  }

  /** Write one PREASSEMBLED block (header + `payload[0, payloadLen)` verbatim,
    * checksum computed here) and record its offset — the entry point for the
    * columnar layout, whose payload is a directory + per-column sub-streams
    * ([[ColumnarBlocks]]) rather than one codec stream. The caller owns the
    * payload structure; the envelope (offsets, EOS, stats, footer) is shared
    * with the classic path. Must not be interleaved with buffered `write`
    * bytes in the same block (callers use exactly one mode per file).
    */
  def writeRawBlock(uncompressedLen: Int, payload: Array[Byte], payloadLen: Int): Unit = {
    require(bufLen == 0, "writeRawBlock cannot follow buffered bytes in the same block")
    require(uncompressedLen > 0 && uncompressedLen <= FourMc.MaxBlockSize,
      s"raw block uncompressed size $uncompressedLen out of range")
    require(payloadLen > 0 && payloadLen <= uncompressedLen,
      s"raw block payload size $payloadLen out of range (uncompressed $uncompressedLen)")
    blockOffsets += bytesOut
    writeInt(uncompressedLen)
    writeInt(payloadLen)
    writeInt(FourMc.xxhash32(payload, 0, payloadLen))
    out.write(payload, 0, payloadLen)
    bytesOut += payloadLen
  }

  override def flush(): Unit = out.flush()

  override def close(): Unit = {
    if (closed) return
    finish()
    out.close()
    closed = true
  }

  /** Write EOS + footer WITHOUT closing the underlying stream (idempotent) —
    * the Hadoop CompressionOutputStream contract separates finish() from
    * closing the wrapped stream.
    */
  def finish(): Unit = {
    if (closed || finished) return
    flushBlock()
    // EOS marker: an empty block, full 12-byte header of zeros
    writeInt(0); writeInt(0); writeInt(0)
    if (bloomProvider != null && statsProvider != null) {
      val seg = bloomProvider(blockOffsets.length)
      if (seg != null) { out.write(seg); bytesOut += seg.length }
    }
    if (statsProvider != null) {
      val seg = statsProvider(blockOffsets.length)
      if (seg != null) { out.write(seg); bytesOut += seg.length }
    }
    // footer
    val n = blockOffsets.length
    val footerSize = FourMc.FooterFixedLen + 4 * n
    val f = new Array[Byte](footerSize - 4) // checksum appended separately
    putBE(f, 0, footerSize)
    putBE(f, 4, FourMc.Version)
    var prev = 0L
    var i = 0
    while (i < n) {
      putBE(f, 8 + 4 * i, (blockOffsets(i) - prev).toInt)
      prev = blockOffsets(i)
      i += 1
    }
    putBE(f, 8 + 4 * n, footerSize)
    putBE(f, 12 + 4 * n, codec.magic)
    out.write(f)
    bytesOut += f.length
    writeInt(FourMc.xxhash32(f, 0, f.length))
    finished = true
  }

  def bytesWritten: Long = bytesOut
  def blockCount: Int = blockOffsets.length

  /** The flush threshold this writer was configured with. */
  def blockBytesThreshold: Int = blockBytes

  /** Bytes buffered for the current (unflushed) block. */
  def pendingBytes: Int = bufLen
}
