package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `media_header(binary)` — byte-level parse of real media container
  * headers into a typed struct, no decode libraries involved:
  *
  *  - JPEG (SOI marker walk → SOF0/SOF2 frame header): width, height;
  *  - PNG (signature + IHDR): width, height;
  *  - WAV (RIFF chunk walk → fmt + data): channels, sample rate, and
  *    duration in ms derived from the data-chunk byte count;
  *  - anything else (or any truncated/malformed header): NULL.
  *
  * This is the real-decoder replacement for the simulated header parse in
  * [[graft.ops.Multimodal]]: the Spark-side shape is identical (binary
  * column in, typed metadata struct out) but the bytes are genuine JPEG /
  * RIFF structures, parsed with the same bounded-reader discipline as
  * [[ProtoWire]] (every read range-checked; malformed input degrades to
  * NULL, never throws, because at 100 TB some blobs WILL be garbage).
  *
  * Struct output keeps eval-mode (CodegenFallback) like
  * [[ProtoStructExpr]] — the per-blob parse is a handful of branches; the
  * scan and shuffle around it stay codegen'd.
  */
case class MediaHeaderExpr(child: Expression)
    extends UnaryExpression
    with CodegenFallback {

  override def prettyName: String = "media_header"

  override def dataType: DataType = MediaHeaderExpr.schema

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"media_header expects binary input, got ${child.dataType}")

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    MediaHeaderExpr.parse(input.asInstanceOf[Array[Byte]])

  override protected def withNewChildInternal(newChild: Expression): MediaHeaderExpr =
    copy(child = newChild)
}

object MediaHeaderExpr {

  val schema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("duration_ms", LongType)
  ))

  private def be16(b: Array[Byte], i: Int): Int = ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) | ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
  private def le16(b: Array[Byte], i: Int): Int = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) | ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  private def row(format: String, width: Int, height: Int,
                  channels: Int, rate: Int, durationMs: Long): InternalRow =
    InternalRow(
      UTF8String.fromString(format),
      if (width < 0) null else width,
      if (height < 0) null else height,
      if (channels < 0) null else channels,
      if (rate < 0) null else rate,
      if (durationMs < 0) null else durationMs)

  /** Parse a media header; null for unknown/malformed/truncated bytes. */
  def parse(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 12) return null
    if ((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) return parseJpeg(b)
    if ((b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') return parsePng(b)
    if (b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') return parseWav(b)
    null
  }

  /** Marker walk: FF <marker> <len16 incl itself> <payload>, fill FFs
    * allowed; dims live in the SOF frame headers (C0-CF except the
    * C4/C8/CC non-frame markers): precision(1) height(2) width(2).
    */
  private def parseJpeg(b: Array[Byte]): InternalRow = {
    var i = 2
    while (i + 1 < b.length) {
      if ((b(i) & 0xff) != 0xff) return null // lost marker sync
      val marker = b(i + 1) & 0xff
      if (marker == 0xff) { i += 1 } // fill byte
      else if (marker == 0xd9 || marker == 0xda) return null // EOI/SOS before any SOF
      else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) { i += 2 } // standalone
      else {
        if (i + 3 >= b.length) return null
        val segLen = be16(b, i + 2)
        if (segLen < 2) return null
        val isSof = marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc
        if (isSof) {
          if (i + 8 >= b.length || segLen < 7) return null
          val height = be16(b, i + 5)
          val width = be16(b, i + 7)
          if (width == 0 || height == 0) return null
          return row("jpeg", width, height, -1, -1, -1L)
        }
        i += 2 + segLen
      }
    }
    null
  }

  /** PNG signature (8 bytes) + IHDR must be the first chunk: length=13,
    * type "IHDR", width/height as big-endian u32.
    */
  private def parsePng(b: Array[Byte]): InternalRow = {
    if (b.length < 24) return null
    if (!(b(4) == 0x0d && b(5) == 0x0a && b(6) == 0x1a && b(7) == 0x0a)) return null
    if (be32(b, 8) != 13L) return null
    if (!(b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')) return null
    val w = be32(b, 16); val h = be32(b, 20)
    if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) return null
    row("png", w.toInt, h.toInt, -1, -1, -1L)
  }

  /** RIFF chunk walk: fmt (PCM fields) + data (payload size). Duration is
    * derived, not stored: data bytes * 1000 / byte-rate. The data chunk
    * body may extend past the buffer (a head-only read of a large file) —
    * the declared size still yields the duration.
    */
  private def parseWav(b: Array[Byte]): InternalRow = {
    // the cursor is a LONG: a declared chunk size is u32 (le32 returns
    // 0..2^32-1), so Int arithmetic would wrap on a garbage size field
    // >= 2^31 — stalling the walk (i += 0: infinite loop on one row) or
    // driving the index negative (throw). Long strides keep the cursor
    // monotonic (+>=8 per chunk), so the walk always runs off the end of a
    // malformed buffer and degrades to null
    var i = 12L
    var channels = -1
    var rate = -1
    var byteRate = -1L
    var dataSize = -1L
    while (i + 8 <= b.length && (channels < 0 || dataSize < 0)) {
      val o = i.toInt // safe: i + 8 <= b.length <= Int.MaxValue
      val sz = le32(b, o + 4)
      if (b(o) == 'f' && b(o + 1) == 'm' && b(o + 2) == 't' && b(o + 3) == ' ') {
        if (sz < 16 || i + 8 + 16 > b.length) return null
        channels = le16(b, o + 10)
        rate = le32(b, o + 12).toInt
        byteRate = le32(b, o + 16)
      } else if (b(o) == 'd' && b(o + 1) == 'a' && b(o + 2) == 't' && b(o + 3) == 'a') {
        dataSize = sz
      }
      // chunks are word-aligned; the body may be truncated in-buffer, the
      // walk just runs off the end and stops
      i += 8L + sz + (sz & 1L)
    }
    if (channels <= 0 || rate <= 0 || byteRate <= 0 || dataSize < 0) return null
    row("wav", -1, -1, channels, rate, dataSize * 1000L / byteRate)
  }

  def media_header(bin: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    column(MediaHeaderExpr(expression(bin)))
  }
}
