package graft.hadoop

import graft.format._

import org.apache.hadoop.io.compress._

import java.io.{EOFException, IOException, InputStream, OutputStream}

/** Hadoop `CompressionCodec` integration (SURVEY §2 A11): lets ANY Hadoop or
  * Spark output path produce 4mc/4mz containers — mirrors the reference's
  * second headline use (`Readme.md:95-101`,
  * `examples/.../TestTextInput.java:58-76`,
  * `TestProtobufInput.java:115` `saveAsTextFile(path, FourMzHighCodec.class)`):
  *
  *   - `rdd.saveAsTextFile(path, classOf[FourMzHighCodec])`
  *   - `df.write.option("compression", classOf[FourMcCodec].getName).text(path)`
  *   - `spark.read.text(path)` over `.4mc`/`.4mz` files (codec discovered by
  *     extension through the ServiceLoader registration in
  *     `META-INF/services/org.apache.hadoop.io.compress.CompressionCodec`)
  *
  * Decoding is magic-driven — any of these codecs decodes both families at
  * any level, exactly like the splittable `format("4mc")` reader. The codec
  * path itself is NOT splittable (matching the reference, whose codecs handle
  * splitting only through its custom InputFormat); use
  * `spark.read.format("4mc")` for block-parallel scans.
  *
  * The eight classes mirror the reference's level-per-class matrix
  * (`FourMcCodec.java:90-148`, `FourMzCodec.java:57-116`).
  */
abstract class GraftContainerCodec(mc: McCodec) extends CompressionCodec {
  override def getDefaultExtension: String = mc.fileExtension

  override def createOutputStream(out: OutputStream): CompressionOutputStream =
    new FourMcCompressionOutputStream(out, mc)

  override def createOutputStream(out: OutputStream, c: Compressor): CompressionOutputStream =
    createOutputStream(out)

  override def createInputStream(in: InputStream): CompressionInputStream =
    new FourMcCompressionInputStream(in)

  override def createInputStream(in: InputStream, d: Decompressor): CompressionInputStream =
    createInputStream(in)

  // The container writer/reader compress whole blocks internally; the
  // streaming Compressor/Decompressor protocol is bypassed. CodecPool still
  // wants instances, so hand out inert ones.
  override def getCompressorType: Class[_ <: Compressor] = classOf[InertCompressor]
  override def createCompressor(): Compressor = new InertCompressor
  override def getDecompressorType: Class[_ <: Decompressor] = classOf[InertDecompressor]
  override def createDecompressor(): Decompressor = new InertDecompressor
}

class FourMcCodec extends GraftContainerCodec(McCodec.Lz4Fast)
class FourMcMediumCodec extends GraftContainerCodec(McCodec.Lz4Medium)
class FourMcHighCodec extends GraftContainerCodec(McCodec.Lz4High)
class FourMcUltraCodec extends GraftContainerCodec(McCodec.Lz4Ultra)
class FourMzCodec extends GraftContainerCodec(McCodec.Zstd1)
class FourMzMediumCodec extends GraftContainerCodec(McCodec.Zstd3)
class FourMzHighCodec extends GraftContainerCodec(McCodec.Zstd6)
class FourMzUltraCodec extends GraftContainerCodec(McCodec.Zstd12)

/** CompressionOutputStream over [[FourMcWriter]]: finish() emits EOS+footer,
  * the wrapped stream stays open for the caller to close. resetState()
  * (SequenceFile emits one independent compressed segment per record/block)
  * starts a fresh container on the next write — each segment is a complete
  * header|blocks|EOS|footer unit the matching input stream re-enters after
  * its own resetState().
  */
final class FourMcCompressionOutputStream(rawOut: OutputStream, mc: McCodec)
    extends CompressionOutputStream(rawOut) {
  private var writer: FourMcWriter = _

  private def w: FourMcWriter = {
    if (writer == null) writer = new FourMcWriter(new NonClosingOutputStream(rawOut), mc)
    writer
  }

  override def write(b: Int): Unit = w.write(b)
  override def write(b: Array[Byte], off: Int, len: Int): Unit = w.write(b, off, len)
  // finish() with zero writes still emits a VALID empty container
  // (header|EOS|footer) — an empty task partition must not leave a 0-byte
  // file that crashes readers
  override def finish(): Unit = w.finish()
  override def resetState(): Unit = { if (writer != null) writer.finish(); writer = null }
  override def flush(): Unit = rawOut.flush()
}

final class NonClosingOutputStream(out: OutputStream) extends OutputStream {
  override def write(b: Int): Unit = out.write(b)
  override def write(b: Array[Byte], off: Int, len: Int): Unit = out.write(b, off, len)
  override def flush(): Unit = out.flush()
  override def close(): Unit = out.flush() // owner closes the raw stream
}

/** Sequential container decoder over a plain InputStream: header, then one
  * block at a time (xxhash32-verified, store-plain aware), -1 at the EOS
  * marker; the footer stays unread, matching how a non-seekable codec
  * consumer stops at logical EOF.
  */
final class FourMcCompressionInputStream(raw: InputStream)
    extends CompressionInputStream(raw) {
  private var zstd = false
  private var headerRead = false
  private var block: Array[Byte] = _
  private var pos = 0
  private var eos = false

  private def readExactly(n: Int): Array[Byte] = {
    val b = new Array[Byte](n)
    var got = 0
    while (got < n) {
      val r = in.read(b, got, n - got)
      if (r < 0) throw new EOFException(s"truncated 4mc stream: wanted $n bytes, got $got")
      got += r
    }
    b
  }

  /** null on clean EOF before the first byte; throws mid-read. */
  private def readExactlyOrEof(n: Int): Array[Byte] = {
    val b = new Array[Byte](n)
    val first = in.read(b, 0, n)
    if (first < 0) return null
    var got = first
    while (got < n) {
      val r = in.read(b, got, n - got)
      if (r < 0) throw new EOFException(s"truncated 4mc stream: wanted $n bytes, got $got")
      got += r
    }
    b
  }

  private def be(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) | ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)

  /** false on a clean zero-byte stream (an empty file is valid EOF). */
  private def readHeader(): Boolean = {
    val hdr = readExactlyOrEof(FourMc.HeaderLen)
    if (hdr == null) { eos = true; return false }
    val magic = be(hdr, 0)
    if (!FourMc.isContainerMagic(magic))
      throw new IOException(f"not a 4mc/4mz stream (magic 0x$magic%08x)")
    if (be(hdr, 4) != FourMc.Version)
      throw new IOException(s"unsupported 4mc version ${be(hdr, 4)}")
    if (be(hdr, 8) != FourMc.xxhash32(hdr, 0, 8))
      throw new IOException("4mc header checksum mismatch")
    zstd = magic == FourMc.MzMagic
    headerRead = true
    true
  }

  private def ensureBlock(): Boolean = {
    if (!headerRead && !readHeader()) return false
    while (!eos && (block == null || pos >= block.length)) {
      val hdr = readExactly(FourMc.BlockHeaderLen)
      val unc = be(hdr, 0)
      val comp = be(hdr, 4)
      val chk = be(hdr, 8)
      if (unc == 0 && comp == 0 && chk == 0) { eos = true; return false }
      if (unc < 0 || unc > FourMc.MaxBlockSize || comp < 0 || comp > unc)
        throw new IOException(s"corrupt 4mc block header (unc=$unc comp=$comp)")
      val payload = readExactly(comp)
      if (FourMc.xxhash32(payload, 0, comp) != chk)
        throw new IOException("4mc block checksum mismatch")
      block = if (comp == unc) payload else McCodec.decompress(zstd, payload, 0, comp, unc)
      pos = 0
    }
    !eos
  }

  override def read(): Int =
    if (!ensureBlock()) -1
    else {
      val v = block(pos) & 0xff
      pos += 1
      v
    }

  override def read(b: Array[Byte], off: Int, len: Int): Int = {
    if (len == 0) return 0
    if (!ensureBlock()) return -1
    val n = math.min(len, block.length - pos)
    System.arraycopy(block, pos, b, off, n)
    pos += n
    n
  }

  override def resetState(): Unit = {
    headerRead = false
    block = null
    pos = 0
    eos = false
  }
}

/** Inert pool placeholders: the container streams do their own block
  * compression, so the streaming Compressor protocol is never exercised —
  * fail loudly if something tries.
  */
final class InertCompressor extends Compressor {
  private def nope = throw new UnsupportedOperationException(
    "4mc codecs compress whole container blocks; use createOutputStream")
  override def setInput(b: Array[Byte], off: Int, len: Int): Unit = nope
  override def needsInput(): Boolean = true
  override def setDictionary(b: Array[Byte], off: Int, len: Int): Unit = nope
  override def getBytesRead: Long = 0L
  override def getBytesWritten: Long = 0L
  override def finish(): Unit = ()
  override def finished(): Boolean = true
  override def compress(b: Array[Byte], off: Int, len: Int): Int = nope
  override def reset(): Unit = ()
  override def end(): Unit = ()
  override def reinit(conf: org.apache.hadoop.conf.Configuration): Unit = ()
}

final class InertDecompressor extends Decompressor {
  private def nope = throw new UnsupportedOperationException(
    "4mc codecs decompress whole container blocks; use createInputStream")
  override def setInput(b: Array[Byte], off: Int, len: Int): Unit = nope
  override def needsInput(): Boolean = true
  override def setDictionary(b: Array[Byte], off: Int, len: Int): Unit = nope
  override def needsDictionary(): Boolean = false
  override def getRemaining: Int = 0
  override def finished(): Boolean = true
  override def decompress(b: Array[Byte], off: Int, len: Int): Int = nope
  override def reset(): Unit = ()
  override def end(): Unit = ()
}
