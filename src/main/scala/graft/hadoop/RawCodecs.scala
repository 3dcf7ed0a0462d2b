package graft.hadoop

import graft.format.McCodec

import com.github.luben.zstd.{ZstdInputStream, ZstdOutputStream}
import org.apache.hadoop.io.compress._

import java.io.{EOFException, IOException, InputStream, OutputStream}

/** The reference's NON-container codec families (SURVEY §2 A13):
  *
  *   - raw block codecs (`Lz4Codec.java:54-164`, `ZstdCodec.java:170-171`,
  *     extensions `.lz4_fast`-style): framed 4 MiB blocks with no header,
  *     no footer index, no checksums — smaller and faster than the container
  *     when splittability/integrity aren't needed (shuffle-style data);
  *   - `.zst` full-frame streaming codec (`ZstCodec.java:47-166`): STANDARD
  *     zstd frames via zstd-jni's streaming classes, interoperable with the
  *     `zstd` command-line tool and the reference's own ZstCodec output —
  *     also what `graft.Tool -s` produces.
  *
  * Raw-block framing here is `[uncompressedSize(4BE) | compressedSize(4BE) |
  * payload]*` with the container's store-plain convention
  * (`comp == unc` ⇒ plain); EOF ends the stream (no EOS marker).
  */
abstract class RawBlockCodec(mc: McCodec, ext: String) extends CompressionCodec {
  override def getDefaultExtension: String = ext

  override def createOutputStream(out: OutputStream): CompressionOutputStream =
    new RawBlockOutputStream(out, mc)
  override def createOutputStream(out: OutputStream, c: Compressor): CompressionOutputStream =
    createOutputStream(out)
  override def createInputStream(in: InputStream): CompressionInputStream =
    new RawBlockInputStream(in, mc.zstd)
  override def createInputStream(in: InputStream, d: Decompressor): CompressionInputStream =
    createInputStream(in)
  override def getCompressorType: Class[_ <: Compressor] = classOf[InertCompressor]
  override def createCompressor(): Compressor = new InertCompressor
  override def getDecompressorType: Class[_ <: Decompressor] = classOf[InertDecompressor]
  override def createDecompressor(): Decompressor = new InertDecompressor
}

class Lz4RawCodec extends RawBlockCodec(McCodec.Lz4Fast, ".lz4_fast")
class Lz4RawMediumCodec extends RawBlockCodec(McCodec.Lz4Medium, ".lz4_medium")
class Lz4RawHighCodec extends RawBlockCodec(McCodec.Lz4High, ".lz4_high")
class Lz4RawUltraCodec extends RawBlockCodec(McCodec.Lz4Ultra, ".lz4_ultra")
class ZstdRawCodec extends RawBlockCodec(McCodec.Zstd1, ".zstd_fast")
class ZstdRawMediumCodec extends RawBlockCodec(McCodec.Zstd3, ".zstd_medium")
class ZstdRawHighCodec extends RawBlockCodec(McCodec.Zstd6, ".zstd_high")
class ZstdRawUltraCodec extends RawBlockCodec(McCodec.Zstd12, ".zstd_ultra")

final class RawBlockOutputStream(rawOut: OutputStream, mc: McCodec)
    extends CompressionOutputStream(rawOut) {
  private val buf = new Array[Byte](graft.format.FourMc.MaxBlockSize)
  private var bufLen = 0
  private var finished = false

  private def writeInt(v: Int): Unit = {
    out.write((v >>> 24) & 0xff); out.write((v >>> 16) & 0xff)
    out.write((v >>> 8) & 0xff); out.write(v & 0xff)
  }

  private def flushBlock(): Unit = if (bufLen > 0) {
    val compressed = mc.compress(buf, bufLen)
    writeInt(bufLen)
    if (compressed == null) { writeInt(bufLen); out.write(buf, 0, bufLen) }
    else { writeInt(compressed.length); out.write(compressed) }
    bufLen = 0
  }

  override def write(b: Int): Unit = write(Array(b.toByte), 0, 1)

  override def write(b: Array[Byte], off0: Int, len0: Int): Unit = {
    var off = off0
    var len = len0
    while (len > 0) {
      val n = math.min(len, buf.length - bufLen)
      System.arraycopy(b, off, buf, bufLen, n)
      bufLen += n; off += n; len -= n
      if (bufLen == buf.length) flushBlock()
    }
  }

  override def finish(): Unit = if (!finished) { flushBlock(); finished = true }
  override def resetState(): Unit = { finished = false }
}

final class RawBlockInputStream(raw: InputStream, zstd: Boolean)
    extends CompressionInputStream(raw) {
  private var block: Array[Byte] = _
  private var pos = 0
  private var eof = false

  /** -1 only on clean EOF BEFORE the first byte; the 4-byte word itself is
    * returned unsigned (a corrupt size with the top bit set must surface as
    * a too-large value, not masquerade as EOF and silently truncate).
    */
  private def readIntOrEof(): Long = {
    val b0 = in.read()
    if (b0 < 0) return -1L // clean EOF at a block boundary
    var v = (b0 & 0xff).toLong
    var k = 0
    while (k < 3) {
      val b = in.read()
      if (b < 0) throw new EOFException("truncated raw block header")
      v = (v << 8) | (b & 0xff)
      k += 1
    }
    v
  }

  private def readExactly(n: Int): Array[Byte] = {
    val b = new Array[Byte](n)
    var got = 0
    while (got < n) {
      val r = in.read(b, got, n - got)
      if (r < 0) throw new EOFException("truncated raw block payload")
      got += r
    }
    b
  }

  private def ensureBlock(): Boolean = {
    while (!eof && (block == null || pos >= block.length)) {
      val unc = readIntOrEof()
      if (unc < 0) { eof = true; return false }
      val comp = readIntOrEof()
      if (comp < 0) throw new EOFException("truncated raw block header")
      if (unc > graft.format.FourMc.MaxBlockSize || comp > unc)
        throw new IOException(s"corrupt raw block header (unc=$unc comp=$comp)")
      val payload = readExactly(comp.toInt)
      block = if (comp == unc) payload else McCodec.decompress(zstd, payload, 0, comp.toInt, unc.toInt)
      pos = 0
    }
    !eof
  }

  override def read(): Int =
    if (!ensureBlock()) -1 else { val v = block(pos) & 0xff; pos += 1; v }

  override def read(b: Array[Byte], off: Int, len: Int): Int = {
    if (len == 0) return 0
    if (!ensureBlock()) return -1
    val n = math.min(len, block.length - pos)
    System.arraycopy(block, pos, b, off, n)
    pos += n
    n
  }

  override def resetState(): Unit = { block = null; pos = 0; eof = false }
}

/** `.zst`: standard zstd frames (reference `ZstCodec.java:47-166`). Output
  * interops with the system `zstd` tool and `graft.Tool -s`.
  */
class ZstCodec extends CompressionCodec {
  override def getDefaultExtension: String = ".zst"

  override def createOutputStream(out: OutputStream): CompressionOutputStream =
    new ZstCompressionOutputStream(out, 3)
  override def createOutputStream(out: OutputStream, c: Compressor): CompressionOutputStream =
    createOutputStream(out)
  override def createInputStream(in: InputStream): CompressionInputStream =
    new ZstCompressionInputStream(in)
  override def createInputStream(in: InputStream, d: Decompressor): CompressionInputStream =
    createInputStream(in)
  override def getCompressorType: Class[_ <: Compressor] = classOf[InertCompressor]
  override def createCompressor(): Compressor = new InertCompressor
  override def getDecompressorType: Class[_ <: Decompressor] = classOf[InertDecompressor]
  override def createDecompressor(): Decompressor = new InertDecompressor
}

final class ZstCompressionOutputStream(rawOut: OutputStream, level: Int)
    extends CompressionOutputStream(rawOut) {
  private var zs: ZstdOutputStream = _
  private var finished = false

  private def z: ZstdOutputStream = {
    // a finished frame's encoder is closed — writes after finish (with or
    // without an intervening resetState) start a fresh frame
    if (zs == null || finished) { zs = new ZstdOutputStream(new NonClosingOutputStream(rawOut), level); finished = false }
    zs
  }

  override def write(b: Int): Unit = z.write(b)
  override def write(b: Array[Byte], off: Int, len: Int): Unit = z.write(b, off, len)
  override def finish(): Unit = if (zs != null && !finished) { zs.close(); finished = true }
  // one standard zstd frame per segment; a fresh stream starts on next write
  override def resetState(): Unit = { finish(); zs = null }
  override def flush(): Unit = { if (zs != null && !finished) zs.flush(); rawOut.flush() }
}

final class ZstCompressionInputStream(raw: InputStream) extends CompressionInputStream(raw) {
  // no-close wrapper: decoder turnover must not close the consumer's stream
  private val src = new java.io.FilterInputStream(raw) { override def close(): Unit = () }
  private var z = new ZstdInputStream(src).setContinuous(true)
  override def read(): Int = z.read()
  override def read(b: Array[Byte], off: Int, len: Int): Int = z.read(b, off, len)

  /** SequenceFile RECORD/BLOCK consumers refill the underlying stream and
    * call resetState at every compressed-segment boundary. A no-op here (the
    * r3 state) desyncs: the old decoder's buffered frame state bleeds into
    * the next segment. Start a fresh decoder over the repositioned stream
    * and close the old one (frees its native window).
    */
  override def resetState(): Unit = {
    z.close()
    z = new ZstdInputStream(src).setContinuous(true)
  }

  override def close(): Unit = { z.close(); super.close() }
}
