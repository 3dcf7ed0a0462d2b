package graft.functions

import graft.ops.Multimodal
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Byte-level media header parse: fixture-known dims/durations come back
  * exactly; malformed or truncated headers degrade to null, never throw.
  */
class MediaHeaderSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession
    .builder()
    .master("local[4]")
    .appName("media-header-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private def f(r: org.apache.spark.sql.catalyst.InternalRow): (String, Any, Any, Any, Any, Any) =
    (r.getUTF8String(0).toString,
      if (r.isNullAt(1)) null else r.getInt(1),
      if (r.isNullAt(2)) null else r.getInt(2),
      if (r.isNullAt(3)) null else r.getInt(3),
      if (r.isNullAt(4)) null else r.getInt(4),
      if (r.isNullAt(5)) null else r.getLong(5))

  test("JPEG SOF0 dims parse exactly, marker walk skips APP0/DQT") {
    val r = MediaHeaderExpr.parse(Multimodal.realJpegBytes(640, 480))
    assert(f(r) == ("jpeg", 640, 480, null, null, null))
    // 16-bit dims
    val big = MediaHeaderExpr.parse(Multimodal.realJpegBytes(40000, 30000))
    assert(f(big) == ("jpeg", 40000, 30000, null, null, null))
  }

  test("WAV fmt+data chunks give channels, rate, floor-div duration") {
    // 16-bit stereo 16kHz, 64000 declared data bytes -> 64000*1000/(16000*2*2) = 1000 ms
    val r = MediaHeaderExpr.parse(Multimodal.realWavBytes(2, 16000, 64000))
    assert(f(r) == ("wav", null, null, 2, 16000, 1000L))
    // odd division floors: 1001 bytes mono 8kHz -> 1001*1000/16000 = 62 ms
    val r2 = MediaHeaderExpr.parse(Multimodal.realWavBytes(1, 8000, 1001))
    assert(f(r2) == ("wav", null, null, 1, 8000, 62L))
  }

  test("PNG IHDR dims parse") {
    val png = java.nio.ByteBuffer.allocate(24)
    png.put(Array[Byte](0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte, 0x0d, 0x0a, 0x1a, 0x0a))
    png.putInt(13).put("IHDR".getBytes("US-ASCII")).putInt(800).putInt(600)
    assert(f(MediaHeaderExpr.parse(png.array())) == ("png", 800, 600, null, null, null))
  }

  test("garbage, truncation, and missing-SOF degrade to null") {
    assert(MediaHeaderExpr.parse(null) == null)
    assert(MediaHeaderExpr.parse(Array[Byte](1, 2, 3)) == null)
    assert(MediaHeaderExpr.parse(Array.fill[Byte](64)(0x41)) == null)
    val jpeg = Multimodal.realJpegBytes(100, 100)
    // cut before the SOF0 segment
    assert(MediaHeaderExpr.parse(jpeg.take(20)) == null)
    // corrupt the marker stream
    val bad = jpeg.clone(); bad(2) = 0x00
    assert(MediaHeaderExpr.parse(bad) == null)
    val wav = Multimodal.realWavBytes(2, 16000, 64000)
    assert(MediaHeaderExpr.parse(wav.take(20)) == null)
  }

  test("WAV junk chunk with u32 size >= 2^31 terminates and returns null") {
    // a garbage chunk whose size field reads as 0xFFFFFFF8 used to wrap to
    // Int -8 and stall the walk (i += 0: infinite loop on one row); sizes
    // around 2^31 drove the cursor negative and threw. Both must degrade to
    // null via the Long-cursor walk running off the end of the buffer.
    for (sz <- Seq(0xFFFFFFF8L, 0x80000000L, 0x7FFFFFFFL)) {
      val b = java.nio.ByteBuffer.allocate(32).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes("US-ASCII")).putInt(24).put("WAVE".getBytes("US-ASCII"))
      b.put("junk".getBytes("US-ASCII")).putInt(sz.toInt) // u32 size field
      assert(MediaHeaderExpr.parse(b.array()) == null, f"size 0x$sz%x must not hang or throw")
    }
  }

  test("media_header is registered as a SQL function via GraftExtensions") {
    // fresh session over the (possibly shared) context so withExtensions
    // actually applies — same pattern as BinaryRecordsSpec/FrequencySketchSpec
    spark.sparkContext
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val session = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new graft.GraftExtensions)
        .getOrCreate()
      import session.implicits._
      session.createDataset(Seq(0L, 1L, 7L)).map(Multimodal.realMediaBlob(_).payload)
        .toDF("b").createOrReplaceTempView("blobs")
      val rows = session.sql(
        "SELECT media_header(b).format AS fmt, media_header(b).width AS w FROM blobs ORDER BY fmt NULLS LAST"
      ).collect()
      assert(rows.map(_.getString(0)).toSeq == Seq("jpeg", "wav", "wav"))
      assert(rows.head.getInt(1) == 16) // id 0: width = 0 % 500 + 16
      session.catalog.dropTempView("blobs")
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }

  test("parsed fields equal the id arithmetic across a blob sweep") {
    (0L until 200L).foreach { id =>
      val rec = Multimodal.realMediaBlob(id)
      val r = MediaHeaderExpr.parse(rec.payload)
      assert(r != null, s"id $id failed to parse")
      if (id % 2 == 0) {
        assert(f(r) == ("jpeg", (id % 500 + 16).toInt, (id % 300 + 16).toInt, null, null, null), s"id $id")
      } else {
        val ch = if (id % 4 == 3) 2 else 1
        val rate = (8000 * (1 + id % 3)).toInt
        val dur = (1000 + id % 5000) * 1000L / (rate * ch * 2)
        assert(f(r) == ("wav", null, null, ch, rate, dur), s"id $id")
      }
    }
  }
}
