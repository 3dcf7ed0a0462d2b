package graft.functions

import scala.collection.mutable.ArrayBuffer

/** Protocol-buffers WIRE FORMAT codec (the public encoding: little-endian
  * base-128 varints, `key = fieldNo << 3 | wireType`, length-delimited
  * strings) — no protobuf-java dependency. This is the typed-record analog
  * of the reference's Elephant-Bird protobuf path
  * (`examples/.../FourMcEbProtoInputFormat.java:34-58`,
  * `user.proto:7-14`): messages ride the 4mc container's length-prefixed
  * binary payload; fields decode straight to Spark rows via
  * [[ProtoStructExpr]].
  *
  * Field spec mini-language (schema known at plan time, like a compiled
  * proto): `"1:name:string,2:id:long,3:tags:rstring"` — kinds: `long`
  * (varint int64), `int` (varint int32), `bool`, `string`, `bytes`,
  * `double` (fixed64), `float` (fixed32), `rstring` (repeated string),
  * `rlong` (repeated varint). Unknown fields are skipped per proto
  * semantics.
  */
object ProtoWire {

  sealed trait Kind
  case object KLong extends Kind
  case object KInt extends Kind
  case object KBool extends Kind
  case object KString extends Kind
  case object KBytes extends Kind
  case object KDouble extends Kind
  case object KFloat extends Kind
  case object KRepString extends Kind
  case object KRepLong extends Kind
  case object KRepBytes extends Kind

  final case class Field(no: Int, name: String, kind: Kind)

  /** The wire type each kind is encoded with (0 varint, 1 fixed64, 2
    * length-delimited, 5 fixed32). Repeated varints ENCODE packed (wire
    * type 2, the proto3 default) but DECODE from either representation —
    * see [[ProtoStructExpr]].
    */
  def wireTypeOf(k: Kind): Int = k match {
    case KLong | KInt | KBool | KRepLong           => 0
    case KDouble                                   => 1
    case KString | KBytes | KRepString | KRepBytes => 2
    case KFloat                                    => 5
  }

  def parseSpec(spec: String): Seq[Field] =
    spec.split(",").toSeq.map { s =>
      val Array(no, name, kind) = s.trim.split(":")
      val k = kind match {
        case "long"    => KLong
        case "int"     => KInt
        case "bool"    => KBool
        case "string"  => KString
        case "bytes"   => KBytes
        case "double"  => KDouble
        case "float"   => KFloat
        case "rstring" => KRepString
        case "rlong"   => KRepLong
        case "rbytes"  => KRepBytes
        case other     => throw new IllegalArgumentException(s"unknown proto kind $other")
      }
      Field(no.toInt, name, k)
    }

  // ------------------------------------------------------------------ encode

  final class Writer {
    private val buf = new ArrayBuffer[Byte](64)

    def toBytes: Array[Byte] = buf.toArray

    def writeVarint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0) {
        buf += ((v & 0x7f) | 0x80).toByte
        v >>>= 7
      }
      buf += (v & 0x7f).toByte
    }

    private def key(no: Int, wt: Int): Unit = writeVarint((no.toLong << 3) | wt)

    def int64(no: Int, v: Long): Unit = { key(no, 0); writeVarint(v) }
    def bool(no: Int, v: Boolean): Unit = { key(no, 0); writeVarint(if (v) 1 else 0) }

    def fixed64(no: Int, v: Long): Unit = {
      key(no, 1)
      var i = 0
      while (i < 8) { buf += ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
    }

    def fixed32(no: Int, v: Int): Unit = {
      key(no, 5)
      var i = 0
      while (i < 4) { buf += ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
    }

    def double(no: Int, v: Double): Unit = fixed64(no, java.lang.Double.doubleToLongBits(v))
    def float(no: Int, v: Float): Unit = fixed32(no, java.lang.Float.floatToIntBits(v))

    def bytes(no: Int, v: Array[Byte]): Unit = {
      key(no, 2); writeVarint(v.length.toLong); buf ++= v
    }

    def string(no: Int, v: String): Unit = bytes(no, v.getBytes("UTF-8"))

    /** Packed repeated varints (proto3's default encoding for repeated
      * scalars): one length-delimited field holding the concatenated varint
      * run.
      */
    def packedInt64s(no: Int, vs: Seq[Long]): Unit = {
      var len = 0L
      vs.foreach(v => len += varintSize(v))
      key(no, 2)
      writeVarint(len)
      vs.foreach(writeVarint)
    }

    private def varintSize(v: Long): Int =
      if (v == 0L) 1 else (63 - java.lang.Long.numberOfLeadingZeros(v)) / 7 + 1
  }

  /** Encode one message: values aligned with `fields` (null = absent;
    * repeated kinds take Seq).
    */
  def encode(fields: Seq[Field], values: Seq[Any]): Array[Byte] = {
    val w = new Writer
    fields.zip(values).foreach {
      case (_, null) => ()
      case (f, v) =>
        (f.kind, v) match {
          case (KLong, x: Long)      => w.int64(f.no, x)
          case (KInt, x: Int)        => w.int64(f.no, x.toLong)
          case (KBool, x: Boolean)   => w.bool(f.no, x)
          case (KString, x: String)  => w.string(f.no, x)
          case (KBytes, x: Array[Byte]) => w.bytes(f.no, x)
          case (KDouble, x: Double)  => w.double(f.no, x)
          case (KFloat, x: Float)    => w.float(f.no, x)
          case (KRepString, xs: Seq[_]) => xs.foreach(x => w.string(f.no, x.asInstanceOf[String]))
          case (KRepBytes, xs: Seq[_])  => xs.foreach(x => w.bytes(f.no, x.asInstanceOf[Array[Byte]]))
          // packed, like proto3 encoders; empty repeated fields are omitted
          case (KRepLong, xs: Seq[_]) =>
            if (xs.nonEmpty) w.packedInt64s(f.no, xs.map(_.asInstanceOf[Long]))
          case (k, x) => throw new IllegalArgumentException(s"cannot encode $x as $k")
        }
    }
    w.toBytes
  }

  // ------------------------------------------------------------------ decode

  /** Bounded cursor over `b[start, end)`. Every read and skip is bounds-
    * checked against `end` with overflow-safe arithmetic, so adversarial
    * lengths raise IOException — never ArrayIndexOutOfBounds — and a
    * sub-Reader windowed on a packed field cannot run past it.
    */
  final class Reader(b: Array[Byte], start: Int, end: Int) {
    def this(b: Array[Byte]) = this(b, 0, b.length)
    var pos = start
    def hasMore: Boolean = pos < end

    def readVarint(): Long = {
      var shift = 0
      var v = 0L
      var more = true
      while (more) {
        if (pos >= end) throw new java.io.IOException("truncated varint")
        val x = b(pos); pos += 1
        v |= (x & 0x7fL) << shift
        shift += 7
        more = (x & 0x80) != 0
        if (shift > 70) throw new java.io.IOException("varint too long")
      }
      v
    }

    def readFixed64(): Long = {
      if (end - pos < 8) throw new java.io.IOException("truncated fixed64")
      var v = 0L
      var i = 0
      while (i < 8) { v |= (b(pos + i) & 0xffL) << (8 * i); i += 1 }
      pos += 8
      v
    }

    def readFixed32(): Int = {
      if (end - pos < 4) throw new java.io.IOException("truncated fixed32")
      var v = 0
      var i = 0
      while (i < 4) { v |= (b(pos + i) & 0xff) << (8 * i); i += 1 }
      pos += 4
      v
    }

    def readDelimited(): (Int, Int) = { // (offset, length) into b
      // compare as Long BEFORE narrowing: a length like 2^32+5 would .toInt
      // to a small positive number and silently desynchronize the stream
      val lenL = readVarint()
      if (lenL < 0L || lenL > (end - pos).toLong) throw new java.io.IOException("truncated field")
      val len = lenL.toInt
      val off = pos
      pos += len
      (off, len)
    }

    def skip(wireType: Int): Unit = wireType match {
      case 0 => readVarint()
      case 1 =>
        if (end - pos < 8) throw new java.io.IOException("truncated fixed64")
        pos += 8
      case 2 => val _ = readDelimited()
      case 5 =>
        if (end - pos < 4) throw new java.io.IOException("truncated fixed32")
        pos += 4
      case wt => throw new java.io.IOException(s"unsupported wire type $wt")
    }

    def bytes: Array[Byte] = b
  }
}
