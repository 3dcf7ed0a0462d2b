package graft.format

import net.jpountz.lz4.LZ4Factory
import net.jpountz.xxhash.XXHashFactory
import com.github.luben.zstd.Zstd

/** 4mc / 4mz container constants.
  *
  * Layout (all big-endian, checksums XXHASH32 seed 0), per the public spec
  * `/root/reference/4mc-format-spec:1-36` and `/root/reference/4mz-format-spec:1-36`:
  *
  * {{{
  * HEADER(12) | BLOCK_1 | ... | BLOCK_N | EOS(12 zero bytes) | FOOTER
  * HEADER = magic(4) version(4) xxhash32(first 8 bytes)(4)
  * BLOCK  = uncompressedSize(4) compressedSize(4) xxhash32(payload)(4) payload
  *          (compressedSize == uncompressedSize => payload stored PLAIN)
  * FOOTER = footerSize(4) version(4) delta(4)xN footerSize(4) magic(4)
  *          xxhash32(all previous footer bytes)(4);   footerSize = 20 + 4*N
  * }}}
  *
  * Deltas are block-start file offsets, delta-encoded: first delta is the
  * absolute offset of block 1 (= 12, just after the header), each next delta
  * is the difference from the previous block start.
  */
object FourMc {
  val McMagic: Int = 0x344d4300 // "4MC\0"
  val MzMagic: Int = 0x344d5a00 // "4MZ\0"
  val Version: Int = 1
  // Revision of the csv PAYLOAD encoding (not the container): keys cached
  // bench/test fixtures so data from an older encoder is never reused
  // after an encoding change. r13 = arrays r12 + DATE/DECIMAL columns.
  val PayloadRevision: Int = 13
  val MaxBlockSize: Int = 4 * 1024 * 1024
  val HeaderLen: Int = 12
  val EosLen: Int = 12
  val BlockHeaderLen: Int = 12
  val FooterFixedLen: Int = 20 // size,version,[deltas],size,magic,checksum minus deltas

  private val xxf = XXHashFactory.fastestInstance()

  /** XXHASH32, seed 0 — the only checksum the container uses. */
  def xxhash32(buf: Array[Byte], off: Int, len: Int): Int =
    xxf.hash32().hash(buf, off, len, 0)

  /** XXHASH64, seed 0 — STRING-key hashing for the bloom segment
    * ([[BlockBlooms]]); never a container checksum. Writer and probe hash
    * the same unescaped UTF-8 value bytes, so membership is well-defined.
    */
  def xxhash64(buf: Array[Byte], off: Int, len: Int): Long =
    xxf.hash64().hash(buf, off, len, 0L)

  def magicFor(zstd: Boolean): Int = if (zstd) MzMagic else McMagic

  def isContainerMagic(m: Int): Boolean = m == McMagic || m == MzMagic
}

/** One algorithm+level combination. The level is a writer-side choice only —
  * it never appears in the file, so any reader decodes any level (matching the
  * reference's class-per-level codec matrix, `FourMcCodec.java:90-148`).
  */
sealed trait McCodec extends Serializable {
  def name: String
  def zstd: Boolean
  def magic: Int = FourMc.magicFor(zstd)
  def fileExtension: String = if (zstd) ".4mz" else ".4mc"

  /** Compress src[0,len). Returns null when the result would not be strictly
    * smaller than the input — the caller then stores the block PLAIN
    * (`compressedSize == uncompressedSize` convention, 4mc-format-spec:26).
    */
  def compress(src: Array[Byte], len: Int): Array[Byte] = {
    val dst = new Array[Byte](maxCompressedLength(len))
    val n = compressInto(src, len, dst, 0)
    if (n < 0) null else java.util.Arrays.copyOf(dst, n)
  }

  /** Worst-case compressed size of a `len`-byte input (scratch sizing). */
  def maxCompressedLength(len: Int): Int

  /** Zero-allocation variant: compress src[0,len) into dst at dstOff (which
    * must have [[maxCompressedLength]] room). Returns the compressed length,
    * or -1 when the result would not be strictly smaller than the input
    * (store-plain convention, same as [[compress]] returning null). The
    * columnar writer compresses K sub-streams per block through this — the
    * boxed path's per-call output allocation and (for zstd) per-call native
    * context setup priced at K× per block, measured 1.26-1.40× write time.
    */
  def compressInto(src: Array[Byte], len: Int, dst: Array[Byte], dstOff: Int): Int
}

object McCodec {
  private lazy val lz4 = LZ4Factory.fastestInstance()

  final case class Lz4(name: String, level: Int) extends McCodec {
    def zstd = false
    def maxCompressedLength(len: Int): Int =
      lz4.fastCompressor().maxCompressedLength(len)
    def compressInto(src: Array[Byte], len: Int, dst: Array[Byte], dstOff: Int): Int = {
      val c =
        if (level <= 0) lz4.fastCompressor()
        else lz4.highCompressor(level)
      val n = c.compress(src, 0, len, dst, dstOff, dst.length - dstOff)
      if (n >= len) -1 else n
    }
  }

  final case class ZstdC(name: String, level: Int) extends McCodec {
    def zstd = true
    def maxCompressedLength(len: Int): Int =
      Zstd.compressBound(len.toLong).toInt
    def compressInto(src: Array[Byte], len: Int, dst: Array[Byte], dstOff: Int): Int = {
      // per-thread reusable CCtx (the compression mirror of zstdDCtx below):
      // the static Zstd.compress allocates and frees a native context per
      // call, which the columnar layout pays once PER SUB-STREAM
      val ctx = McCodec.zstdCCtx.get().setLevel(level)
      val n = ctx.compressByteArray(dst, dstOff, dst.length - dstOff, src, 0, len)
      if (n >= len) -1 else n
    }
  }

  // Level mapping mirrors the reference matrix (SURVEY §1.3):
  // lz4 fast / medium(HC2 stand-in for the vendored "MC" codec) / high(HC4) /
  // ultra(HC8); zstd 1 / 3 / 6 / 12.
  val Lz4Fast: McCodec = Lz4("lz4-fast", 0)
  val Lz4Medium: McCodec = Lz4("lz4-medium", 2)
  val Lz4High: McCodec = Lz4("lz4-high", 4)
  val Lz4Ultra: McCodec = Lz4("lz4-ultra", 8)
  val Zstd1: McCodec = ZstdC("zstd-1", 1)
  val Zstd3: McCodec = ZstdC("zstd-3", 3)
  val Zstd6: McCodec = ZstdC("zstd-6", 6)
  val Zstd12: McCodec = ZstdC("zstd-12", 12)

  val all: Seq[McCodec] =
    Seq(Lz4Fast, Lz4Medium, Lz4High, Lz4Ultra, Zstd1, Zstd3, Zstd6, Zstd12)

  private val byName: Map[String, McCodec] =
    all.map(c => c.name -> c).toMap ++ Map(
      "lz4" -> Lz4Fast,
      "zstd" -> Zstd3,
      "zstd-fast" -> Zstd1,
      "zstd-medium" -> Zstd3,
      "zstd-high" -> Zstd6,
      "zstd-ultra" -> Zstd12
    )

  def apply(name: String): McCodec =
    byName.getOrElse(
      name.toLowerCase,
      throw new IllegalArgumentException(
        s"unknown 4mc codec '$name' (valid: ${byName.keys.toSeq.sorted.mkString(", ")})"
      )
    )

  // Per-thread reusable zstd decompression context: the static
  // Zstd.decompress allocates and frees a native DCtx (~100+ KB workspace)
  // on EVERY call — at one call per block that is measurable against a
  // 1 MiB block decode — and its byte[] overload has no (offset, length)
  // form, forcing a copy of the compressed slice. decompressByteArray on a
  // reused context does neither. Executor task threads are pooled, so one
  // context per thread is bounded; contexts die with their thread (the
  // same lifetime argument as the reference's DirectBufferPool,
  // `util/DirectBufferPool.java:88-116`, which heap codecs otherwise
  // obsolete).
  private val zstdDCtx = new ThreadLocal[com.github.luben.zstd.ZstdDecompressCtx] {
    override def initialValue() = new com.github.luben.zstd.ZstdDecompressCtx()
  }

  // The compression mirror: one reusable CCtx per writer thread, re-leveled
  // per call (setLevel is a cheap parameter set, not a context rebuild).
  private[format] val zstdCCtx = new ThreadLocal[com.github.luben.zstd.ZstdCompressCtx] {
    override def initialValue() = new com.github.luben.zstd.ZstdCompressCtx()
  }

  /** Decompression is magic-driven, not codec-driven: any 4mc reader decodes
    * both families by dispatching on the file magic.
    */
  def decompress(
      zstd: Boolean,
      src: Array[Byte],
      srcOff: Int,
      srcLen: Int,
      uncompressedLen: Int
  ): Array[Byte] = {
    val out = new Array[Byte](uncompressedLen)
    if (zstd) {
      val n = zstdDCtx.get().decompressByteArray(out, 0, uncompressedLen, src, srcOff, srcLen)
      if (n != uncompressedLen)
        throw new java.io.IOException(
          s"4mz block decompressed to $n bytes, expected $uncompressedLen"
        )
    } else {
      lz4.safeDecompressor().decompress(src, srcOff, srcLen, out, 0, uncompressedLen)
    }
    out
  }
}
