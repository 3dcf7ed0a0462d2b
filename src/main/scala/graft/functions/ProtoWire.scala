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

  final case class Field(no: Int, name: String, kind: Kind)

  /** The wire type each kind is encoded with (0 varint, 1 fixed64, 2
    * length-delimited, 5 fixed32).
    */
  def wireTypeOf(k: Kind): Int = k match {
    case KLong | KInt | KBool | KRepLong => 0
    case KDouble                         => 1
    case KString | KBytes | KRepString   => 2
    case KFloat                          => 5
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
          case (KRepLong, xs: Seq[_])   => xs.foreach(x => w.int64(f.no, x.asInstanceOf[Long]))
          case (k, x) => throw new IllegalArgumentException(s"cannot encode $x as $k")
        }
    }
    w.toBytes
  }

  // ------------------------------------------------------------------ decode

  final class Reader(b: Array[Byte]) {
    var pos = 0
    def hasMore: Boolean = pos < b.length

    def readVarint(): Long = {
      var shift = 0
      var v = 0L
      var more = true
      while (more) {
        if (pos >= b.length) throw new java.io.IOException("truncated varint")
        val x = b(pos); pos += 1
        v |= (x & 0x7fL) << shift
        shift += 7
        more = (x & 0x80) != 0
        if (shift > 70) throw new java.io.IOException("varint too long")
      }
      v
    }

    def readFixed64(): Long = {
      var v = 0L
      var i = 0
      while (i < 8) { v |= (b(pos + i) & 0xffL) << (8 * i); i += 1 }
      pos += 8
      v
    }

    def readFixed32(): Int = {
      var v = 0
      var i = 0
      while (i < 4) { v |= (b(pos + i) & 0xff) << (8 * i); i += 1 }
      pos += 4
      v
    }

    def readDelimited(): (Int, Int) = { // (offset, length) into b
      val len = readVarint().toInt
      if (len < 0 || pos + len > b.length) throw new java.io.IOException("truncated field")
      val off = pos
      pos += len
      (off, len)
    }

    def skip(wireType: Int): Unit = wireType match {
      case 0 => readVarint()
      case 1 => pos += 8
      case 2 => val _ = readDelimited()
      case 5 => pos += 4
      case wt => throw new java.io.IOException(s"unsupported wire type $wt")
    }

    def bytes: Array[Byte] = b
  }
}
