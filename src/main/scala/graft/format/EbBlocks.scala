package graft.format

import graft.functions.ProtoWire

import scala.collection.mutable.ArrayBuffer

/** Elephant-Bird "SerializedBlock" framing (the reference's protobuf payload:
  * `examples/.../FourMcEbProtoInputFormat.java:34-58` adapts EB's
  * LzoProtobufBlockRecordReader onto the container). One EB block on the
  * uncompressed stream is:
  *
  * {{{
  *   [16-byte sync marker][varint blockLength][SerializedBlock protobuf]
  * }}}
  *
  * where SerializedBlock (EB's `block_storage.proto`) is
  * `version=1 (int32, field 1), proto_class_name (string, field 2),
  * proto_blobs (repeated bytes, field 3)` — each blob one application
  * message. Readers resynchronize by scanning for the marker, which is what
  * makes the framing split-tolerant: a split starts at the first marker at or
  * after its aligned start and finishes the block it began even when the
  * payload spans into the next split's byte range.
  *
  * The default marker below is a stable graft constant; EB deployments pin
  * their own 16 bytes (EB's `Protobufs.KNOWN_GOOD_POSITION_MARKER`, not
  * vendorable offline), so both the reader and writer accept
  * `option("ebMarker", "<32 hex chars>")` for byte-compat with a given
  * deployment's files.
  */
object EbBlocks {

  val SerializedBlockSpec = "1:version:int,2:proto_class_name:string,3:proto_blobs:rbytes"

  val MarkerLen = 16

  val DefaultMarker: Array[Byte] = Array(
    0x29, 0xd8, 0xd5, 0x06, 0x58, 0xcd, 0x4c, 0xab,
    0xb7, 0xa7, 0x1f, 0x42, 0x6b, 0x33, 0x9e, 0x65
  ).map(_.toByte)

  def parseMarker(hex: Option[String]): Array[Byte] = hex match {
    case None => DefaultMarker
    case Some(h) =>
      require(h.length == MarkerLen * 2, s"ebMarker must be ${MarkerLen * 2} hex chars, got ${h.length}")
      h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
  }

  /** One framed EB block: marker + varint length + SerializedBlock bytes. */
  def blockBytes(className: String, blobs: Seq[Array[Byte]], marker: Array[Byte] = DefaultMarker): Array[Byte] = {
    val body = ProtoWire.encode(
      ProtoWire.parseSpec(SerializedBlockSpec),
      Seq(1, className, blobs))
    val w = new ProtoWire.Writer
    w.writeVarint(body.length.toLong)
    marker ++ w.toBytes ++ body
  }

  /** Decode a SerializedBlock body into its proto blobs (bounds-checked by
    * the shared wire reader; unknown fields skipped).
    */
  def parseBlobs(body: Array[Byte]): Seq[Array[Byte]] = {
    val r = new ProtoWire.Reader(body)
    val blobs = new ArrayBuffer[Array[Byte]](32)
    while (r.hasMore) {
      val k = r.readVarint()
      val no = (k >>> 3).toInt
      val wt = (k & 7).toInt
      if (no == 3 && wt == 2) {
        val (off, len) = r.readDelimited()
        blobs += java.util.Arrays.copyOfRange(body, off, off + len)
      } else r.skip(wt)
    }
    blobs.toSeq
  }
}
