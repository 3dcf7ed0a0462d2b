package graft.functions

import graft.functions.ProtoWire._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Protobuf wire-format conformance: golden bytes computed by hand from the
  * public encoding spec (varints, key = fieldNo<<3 | wireType,
  * length-delimited strings), roundtrips incl. negative ints and unicode,
  * unknown-field skipping, and the proto_struct expression end-to-end.
  */
class ProtoWireSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession
    .builder()
    .master("local[4]")
    .appName("proto-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val userSpec = "1:name:string,2:id:long,3:tags:rstring"
  private val userFields = parseSpec(userSpec)

  test("golden bytes: the official example encodings") {
    // proto spec's own example: field 1 (varint) = 150 -> 08 96 01
    val g1 = ProtoWire.encode(parseSpec("1:id:long"), Seq(150L))
    assert(g1.toSeq == Seq(0x08, 0x96, 0x01).map(_.toByte))
    // field 2 (string) = "testing" -> 12 07 74 65 73 74 69 6e 67
    val g2 = ProtoWire.encode(parseSpec("2:s:string"), Seq("testing"))
    assert(g2.toSeq == (Seq(0x12, 0x07) ++ "testing".getBytes("UTF-8").toSeq.map(_.toInt)).map(_.toByte))
    // negative int64 is ten varint bytes: -2 -> 08 fe ff ff ff ff ff ff ff ff 01
    val g3 = ProtoWire.encode(parseSpec("1:id:long"), Seq(-2L))
    assert(g3.length == 11 && g3(0) == 0x08.toByte && g3(1) == 0xfe.toByte && g3(10) == 0x01.toByte)
  }

  test("message roundtrip with repeated fields, unicode, absent fields") {
    val cases = Seq(
      Seq[Any]("Alice", 42L, Seq("a", "b", "c")),
      Seq[Any]("", 0L, Seq.empty[String]),
      Seq[Any]("héllo ✓", -9223372036854775808L, Seq("日本語", "")),
      Seq[Any](null, 7L, Seq("only-tags"))
    )
    for (vals <- cases) {
      val bytes = ProtoWire.encode(userFields, vals)
      val r = new Reader(bytes)
      var name: String = null
      var id: java.lang.Long = null
      val tags = scala.collection.mutable.ArrayBuffer.empty[String]
      while (r.hasMore) {
        val k = r.readVarint()
        ((k >>> 3).toInt, (k & 7).toInt) match {
          case (1, 2) => val (o, l) = r.readDelimited(); name = new String(r.bytes, o, l, "UTF-8")
          case (2, 0) => id = r.readVarint()
          case (3, 2) => val (o, l) = r.readDelimited(); tags += new String(r.bytes, o, l, "UTF-8")
          case (_, wt) => r.skip(wt)
        }
      }
      assert(Option(name) == Option(vals(0)).map(_.asInstanceOf[String]))
      // empty repeated and id=0 still encode (we write explicitly when non-null)
      assert(id == vals(1).asInstanceOf[Long])
      assert(tags.toSeq == vals(2).asInstanceOf[Seq[String]])
    }
  }

  test("proto_struct expression decodes and skips unknown fields") {
    import spark.implicits._
    // encode with an EXTRA field 9 the reader spec doesn't know
    val fieldsPlus = parseSpec(userSpec + ",9:extra:double")
    val rows = (0 until 500).map { i =>
      ProtoWire.encode(fieldsPlus, Seq(s"user-$i", i.toLong, Seq(s"t${i % 7}", s"t${i % 3}"), i * 0.5))
    }
    val df = rows.toDF("value")
      .select(ProtoFunctions.proto_struct(col("value"), userSpec).as("m"))
      .select($"m.name", $"m.id", $"m.tags")
    val got = df.collect()
    assert(got.length == 500)
    assert(got.forall(r => r.getString(0) == s"user-${r.getLong(1)}"))
    assert(got.forall(r => r.getSeq[String](2).length == 2))
    // explode + count matches direct computation
    val cnt = df.select(explode($"tags").as("t")).groupBy($"t").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // occurrences, not rows: i % 21 == 0 contributes two t0 tags
    assert(cnt("t0") == (0 until 500).count(_ % 7 == 0) + (0 until 500).count(_ % 3 == 0))
  }

  test("wire-type mismatch is skipped, not mis-decoded") {
    import spark.implicits._
    // field 2 encoded as a STRING, read with a spec expecting a varint long:
    // the decoder must skip by the actual wire type and keep parsing
    val bytes = ProtoWire.encode(parseSpec("1:name:string,2:oops:string,3:tags:rstring"),
      Seq("Alice", "not-a-number", Seq("t1")))
    val row = Seq(bytes).toDF("value")
      .select(ProtoFunctions.proto_struct(col("value"), userSpec).as("m"))
      .select($"m.name", $"m.id", $"m.tags")
      .head()
    assert(row.getString(0) == "Alice")
    assert(row.isNullAt(1)) // mismatched field comes back absent
    assert(row.getSeq[String](2) == Seq("t1"))
  }

  test("packed repeated int64: golden bytes, roundtrip, mixed with unpacked") {
    import spark.implicits._
    // proto spec's packed example: field 6 = [3, 270, 86942]
    //   -> 32 06 03 8E 02 9E A7 05
    val g = ProtoWire.encode(parseSpec("6:v:rlong"), Seq(Seq(3L, 270L, 86942L)))
    assert(g.toSeq == Seq(0x32, 0x06, 0x03, 0x8e, 0x02, 0x9e, 0xa7, 0x05).map(_.toByte))
    // expression decodes the packed run
    val spec = "1:id:long,2:vals:rlong"
    val cases = Seq(
      Seq(1L, 2L, 3L),
      Seq(0L, Long.MaxValue, Long.MinValue, -1L),
      Seq(150L)
    )
    for (vs <- cases) {
      val bytes = ProtoWire.encode(parseSpec(spec), Seq(7L, vs))
      val row = Seq(bytes).toDF("value")
        .select(ProtoFunctions.proto_struct(col("value"), spec).as("m"))
        .select($"m.id", $"m.vals").head()
      assert(row.getLong(0) == 7L)
      assert(row.getSeq[Long](1) == vs, s"packed roundtrip of $vs")
    }
    // unpacked occurrences (old-style wire type 0) still decode, and a
    // packed run CONCATENATES with them per the spec
    val w = new ProtoWire.Writer
    w.int64(2, 10L) // unpacked occurrence
    val packedTail = ProtoWire.encode(parseSpec(spec), Seq(null, Seq(20L, 30L)))
    val mixed = w.toBytes ++ packedTail
    val got = Seq(mixed).toDF("value")
      .select(ProtoFunctions.proto_struct(col("value"), spec).as("m"))
      .select($"m.vals").head().getSeq[Long](0)
    assert(got == Seq(10L, 20L, 30L), s"mixed unpacked+packed decoded as $got")
  }

  test("adversarial bytes raise IOException, never ArrayIndexOutOfBounds") {
    def decoding(bytes: Array[Byte])(body: Reader => Unit): Unit = {
      val e = intercept[Exception](body(new Reader(bytes)))
      assert(e.isInstanceOf[java.io.IOException], s"got ${e.getClass}: $e")
    }
    // delimited length Long.MaxValue: overflows pos+len if added naively
    decoding(Array(0x12, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0x7f).map(_.toByte)) { r =>
      r.readVarint(); r.readDelimited()
    }
    // delimited length 2^32+5: .toInt truncates to small positive 5 — must
    // still be rejected (Long comparison), not silently mis-framed
    decoding(Array(0x12, 0x85, 0x80, 0x80, 0x80, 0x10, 1, 2, 3, 4, 5).map(_.toByte)) { r =>
      r.readVarint()
      val (_, len) = r.readDelimited()
      assert(len != 5, "2^32+5 must not truncate to 5")
    }
    // truncated fixed64 (3 of 8 bytes)
    decoding(Array(0x09, 0x01, 0x02, 0x03).map(_.toByte)) { r => r.readVarint(); r.readFixed64() }
    // truncated fixed32 (2 of 4 bytes)
    decoding(Array(0x15, 0x01, 0x02).map(_.toByte)) { r => r.readVarint(); r.readFixed32() }
    // skip() past end for unknown fixed64/fixed32 fields
    decoding(Array(0x79, 0x01).map(_.toByte)) { r => r.readVarint(); r.skip(1) }
    decoding(Array(0x7d, 0x01).map(_.toByte)) { r => r.readVarint(); r.skip(5) }
    // truncated varint (continuation bit set at end of buffer)
    decoding(Array(0x08, 0xff.toByte)) { r => r.readVarint(); r.readVarint() }
  }

  test("proto messages survive the 4mc binary payload") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("proto4mc").toString + "/d"
    val rows = (0 until 2000).map(i => ProtoWire.encode(userFields, Seq(s"u$i", i.toLong, Seq(s"x${i % 5}"))))
    rows.toDF("value").repartition(2)
      .write.format("4mc").option("payload", "binary").option("codec", "zstd-1").save(dir)
    val back = spark.read.format("4mc").option("payload", "binary").load(dir)
      .select(ProtoFunctions.proto_struct(col("value"), userSpec).as("m"))
      .select($"m.id").as[Long].collect().sorted
    assert(back.toSeq == (0L until 2000L))
  }
}
