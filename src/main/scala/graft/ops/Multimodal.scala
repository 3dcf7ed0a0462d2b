package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY §2 D5): image/audio/video as opaque
  * binary columns + typed metadata, moved through the 4mc container's binary
  * payload (length-prefixed records, block-aligned splits).
  *
  * The actual media decode is STUBBED — this container has no image/audio
  * libraries — with a deterministic fake format ("FIMG"/"FAUD" header +
  * big-endian dims + xxhash-derived payload). Everything Spark-side is real:
  * schema, typed Dataset batch path, partitioning, the 4mc binary sink/scan.
  * Swapping `decodeStub` for a real JNI/ffmpeg call changes no plumbing.
  */
object Multimodal {

  case class MediaRecord(media_id: Long, kind: String, payload: Array[Byte])
  case class MediaMeta(
      media_id: Long,
      kind: String,
      width: Int,
      height: Int,
      n_bytes: Int,
      checksum: Long,
      head: Int // first body byte (-1 when the body is empty): a cheap
      //           payload-integrity probe an external oracle can re-derive
  )

  private def putBE(a: Array[Byte], off: Int, v: Int): Unit = {
    a(off) = ((v >>> 24) & 0xff).toByte; a(off + 1) = ((v >>> 16) & 0xff).toByte
    a(off + 2) = ((v >>> 8) & 0xff).toByte; a(off + 3) = (v & 0xff).toByte
  }
  private def getBE(a: Array[Byte], off: Int): Int =
    ((a(off) & 0xff) << 24) | ((a(off + 1) & 0xff) << 16) | ((a(off + 2) & 0xff) << 8) | (a(off + 3) & 0xff)

  /** Deterministic fake blob for id: kind cycles image/audio, dims and bytes
    * derived from the id (so any engine can re-derive and verify counts).
    */
  def fakeBlob(id: Long): MediaRecord = {
    val kind = if (id % 3 == 0) "audio" else "image"
    val w = (id % 64 + 8).toInt
    val h = (id % 48 + 8).toInt
    val body = new Array[Byte](12 + (w * h) % 4096)
    val magic = if (kind == "image") "FIMG" else "FAUD"
    System.arraycopy(magic.getBytes("UTF-8"), 0, body, 0, 4)
    putBE(body, 4, w); putBE(body, 8, h)
    var i = 12
    var x = id * 6364136223846793005L + 1442695040888963407L
    while (i < body.length) { body(i) = (x >>> 56).toByte; x = x * 6364136223846793005L + 1442695040888963407L; i += 1 }
    MediaRecord(id, kind, body)
  }

  /** Distributed synthetic corpus: spark.range → map, no driver data. */
  def syntheticBlobs(spark: SparkSession, n: Long): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.range(n).map(r => fakeBlob(r))
  }

  /** The decode step (STUB): parses the fake header the way a real decoder
    * would parse JPEG/WAV; batch-shaped via mapPartitions so a real decoder
    * could amortize per-batch native setup exactly here.
    */
  def decodeStub(blobs: Dataset[MediaRecord]): Dataset[MediaMeta] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      it.map { r =>
        val p = r.payload
        require(p.length >= 12, s"truncated media payload for ${r.media_id}")
        val magic = new String(p, 0, 4, "UTF-8")
        require(magic == "FIMG" || magic == "FAUD", s"bad media magic $magic")
        var cs = 0L
        var i = 12
        while (i < p.length) { cs = cs * 31 + (p(i) & 0xff); i += 1 }
        val head = if (p.length > 12) p(12) & 0xff else -1
        MediaMeta(r.media_id, r.kind, getBE(p, 4), getBE(p, 8), p.length, cs, head)
      }
    }
  }

  /** Resize stub: deterministic payload transform keeping the header shape. */
  def resizeStub(blobs: Dataset[MediaRecord], maxDim: Int): Dataset[MediaRecord] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      it.map { r =>
        val w = getBE(r.payload, 4); val h = getBE(r.payload, 8)
        if (w <= maxDim && h <= maxDim) r
        else {
          val scale = maxDim.toDouble / math.max(w, h)
          val out = java.util.Arrays.copyOf(r.payload, r.payload.length)
          putBE(out, 4, math.max(1, (w * scale).toInt))
          putBE(out, 8, math.max(1, (h * scale).toInt))
          r.copy(payload = out)
        }
      }
    }
  }

  /** Frame-sample stub: keep every `stride`-th 256-byte chunk of the payload
    * body (a video decoder would emit every k-th frame here); header kept.
    */
  def frameSampleStub(blobs: Dataset[MediaRecord], stride: Int): Dataset[MediaRecord] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      it.map { r =>
        val body = r.payload.drop(12)
        val sampled = body.grouped(256).zipWithIndex
          .collect { case (chunk, i) if i % stride == 0 => chunk }
          .flatten.toArray
        r.copy(payload = r.payload.take(12) ++ sampled)
      }
    }
  }

  /** Feature-extract stub: payload → deterministic 8-dim float vector
    * (byte histogram moments) — the embedding step of a multimodal pipeline,
    * batch-shaped exactly like a real model invocation.
    */
  def featureExtractStub(blobs: Dataset[MediaRecord]): DataFrame = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      it.map { r =>
        val body = r.payload.drop(12)
        val vec = new Array[Float](8)
        var i = 0
        while (i < body.length) {
          vec(body(i) & 7) += 1f
          i += 1
        }
        val n = math.max(1, body.length).toFloat
        (r.media_id, r.kind, vec.map(_ / n).toSeq)
      }
    }.toDF("media_id", "kind", "features")
  }

  /** Serialize (media_id, kind, payload) into one binary record for the 4mc
    * binary sink: id(8) | kindLen(1) | kind | payload.
    */
  def toWire(blobs: Dataset[MediaRecord]): DataFrame = {
    import blobs.sparkSession.implicits._
    blobs
      .map { r =>
        val kb = r.kind.getBytes("UTF-8")
        val out = new Array[Byte](9 + kb.length + r.payload.length)
        var v = r.media_id
        for (i <- 7 to 0 by -1) { out(i) = (v & 0xff).toByte; v >>>= 8 }
        out(8) = kb.length.toByte
        System.arraycopy(kb, 0, out, 9, kb.length)
        System.arraycopy(r.payload, 0, out, 9 + kb.length, r.payload.length)
        out
      }
      .toDF("value")
  }

  def fromWire(df: DataFrame): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    df.select("value").as[Array[Byte]].map { b =>
      var id = 0L
      for (i <- 0 until 8) id = (id << 8) | (b(i) & 0xff)
      val kl = b(8) & 0xff
      val kind = new String(b, 9, kl, "UTF-8")
      MediaRecord(id, kind, java.util.Arrays.copyOfRange(b, 9 + kl, b.length))
    }
  }

  /** End-to-end pipeline: synth → 4mc binary sink → splittable scan → decode
    * → resize → per-kind metrics. Deterministic output for any n.
    */
  def pipelineMetrics(spark: SparkSession, n: Long, dir: String): DataFrame = {
    import spark.implicits._
    val success = new java.io.File(dir, "_SUCCESS")
    if (!success.exists()) {
      toWire(syntheticBlobs(spark, n)).repartition(4)
        .write.mode("overwrite").format("4mc")
        .option("payload", "binary").option("codec", "zstd-1").save(dir)
    }
    val back = fromWire(spark.read.format("4mc").option("payload", "binary").load(dir))
    val meta = decodeStub(resizeStub(back, 32))
    meta
      .groupBy($"kind")
      .agg(
        count(lit(1)).as("n_media"),
        sum($"n_bytes").as("total_bytes"),
        max($"width").as("max_w"),
        max($"height").as("max_h"),
        sum($"head").as("sum_head"),
        sum(pmod($"checksum", lit(1000000007L))).as("checksum_sum") // bounded: ANSI-safe
      )
      .orderBy($"kind")
  }

  // ---- real-format fixtures: genuine JPEG / WAV byte structures ----------
  // (round-8: the simulated FIMG/FAUD decode above keeps the plumbing story;
  // these are REAL container headers parsed by the byte-level
  // [[graft.functions.MediaHeaderExpr]] — no decode library, just the spec.)

  /** A minimal but structurally valid JPEG: SOI, JFIF APP0, a quantization
    * table stub (exercises the marker walk past non-SOF segments), SOF0
    * with the given dims, EOI.
    */
  def realJpegBytes(w: Int, h: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def b(vs: Int*): Unit = vs.foreach(v => out.write(v & 0xff))
    b(0xff, 0xd8) // SOI
    b(0xff, 0xe0, 0x00, 0x10) // APP0 len 16
    out.write("JFIF".getBytes("US-ASCII")); b(0x00, 0x01, 0x01, 0x00, 0x00, 0x01, 0x00, 0x01, 0x00, 0x00)
    b(0xff, 0xdb, 0x00, 0x43, 0x00) // DQT len 67: precision/id + 64 entries
    for (i <- 0 until 64) b(16 + (i % 8))
    b(0xff, 0xc0, 0x00, 0x11, 0x08) // SOF0 len 17, precision 8
    b((h >> 8) & 0xff, h & 0xff, (w >> 8) & 0xff, w & 0xff)
    b(0x03) // 3 components
    b(0x01, 0x22, 0x00, 0x02, 0x11, 0x01, 0x03, 0x11, 0x01)
    b(0xff, 0xd9) // EOI
    out.toByteArray
  }

  /** A minimal valid PCM WAV: RIFF/WAVE, fmt chunk (16-bit PCM), data chunk
    * whose DECLARED size is `dataSize` with a truncated body (header-only
    * read of a big file — the parser derives duration from the declared
    * size, the realistic cheap path at 100 TB).
    */
  def realWavBytes(channels: Int, sampleRate: Int, dataSize: Int): Array[Byte] = {
    val body = math.min(dataSize, 64)
    val out = java.nio.ByteBuffer.allocate(44 + body).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val byteRate = sampleRate * channels * 2
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize).put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort).putShort(channels.toShort).putInt(sampleRate)
      .putInt(byteRate).putShort((channels * 2).toShort).putShort(16.toShort)
    out.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var i = 0
    while (i < body) { out.put((i * 31 + channels).toByte); i += 1 }
    out.array()
  }

  /** Deterministic real-format blob per id — all parameters are pure id
    * arithmetic, so a SQL oracle re-derives every parsed field from
    * generate_series without touching bytes.
    */
  def realMediaBlob(id: Long): MediaRecord =
    if (id % 2 == 0) {
      val w = (id % 500 + 16).toInt
      val h = (id % 300 + 16).toInt
      MediaRecord(id, "jpeg", realJpegBytes(w, h))
    } else {
      val channels = if (id % 4 == 3) 2 else 1
      val rate = (8000 * (1 + id % 3)).toInt
      val dataSize = (1000 + id % 5000).toInt
      MediaRecord(id, "wav", realWavBytes(channels, rate, dataSize))
    }

  /** Real-header pipeline: synth real JPEG/WAV blobs → 4mc binary sink →
    * splittable scan → [[graft.functions.MediaHeaderExpr]] byte parse →
    * per-format aggregate of the PARSED fields. The oracle recomputes the
    * same sums from id arithmetic — any drift in the writer, the scan, or
    * the parser breaks the hash.
    */
  def mediaHeaderPipeline(spark: SparkSession, n: Long, dir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.MediaHeaderExpr.media_header
    val success = new java.io.File(dir, "_SUCCESS")
    if (!success.exists()) {
      toWire(spark.range(n).map(r => realMediaBlob(r))).repartition(4)
        .write.mode("overwrite").format("4mc")
        .option("payload", "binary").option("codec", "zstd-1").save(dir)
    }
    val back = fromWire(spark.read.format("4mc").option("payload", "binary").load(dir))
    back.toDF()
      .withColumn("hdr", media_header(col("payload")))
      .select(col("hdr.format").as("format"),
        col("hdr.width"), col("hdr.height"), col("hdr.channels"),
        col("hdr.sample_rate"), col("hdr.duration_ms"))
      .groupBy(col("format"))
      .agg(
        count(lit(1)).as("n_media"),
        sum(coalesce(col("width"), lit(0))).as("sum_w"),
        sum(coalesce(col("height"), lit(0))).as("sum_h"),
        sum(coalesce(col("channels"), lit(0))).as("sum_channels"),
        sum(coalesce(col("sample_rate"), lit(0))).as("sum_rate_hz"),
        sum(coalesce(col("duration_ms"), lit(0))).as("sum_duration_ms"))
      .orderBy(col("format"))
  }

  /** DuckDB mirror of [[mediaHeaderPipeline]]: every parsed field is pure
    * id arithmetic (dims, channels, rate, declared data size → floor-div
    * duration), so the oracle needs only generate_series.
    */
  def mediaHeaderSql(n: Long): String =
    s"""WITH ids AS (
       |  SELECT unnest(generate_series(0, ${n - 1})) AS id
       |), m AS (
       |  SELECT id,
       |    CASE WHEN id % 2 = 0 THEN 'jpeg' ELSE 'wav' END AS format,
       |    CASE WHEN id % 2 = 0 THEN id % 500 + 16 ELSE 0 END AS w,
       |    CASE WHEN id % 2 = 0 THEN id % 300 + 16 ELSE 0 END AS h,
       |    CASE WHEN id % 2 = 0 THEN 0 WHEN id % 4 = 3 THEN 2 ELSE 1 END AS channels,
       |    CASE WHEN id % 2 = 0 THEN 0 ELSE 8000 * (1 + id % 3) END AS rate,
       |    CASE WHEN id % 2 = 0 THEN 0 ELSE 1000 + id % 5000 END AS data_size
       |  FROM ids
       |)
       |SELECT format, COUNT(*) AS n_media,
       |  CAST(SUM(w) AS BIGINT) AS sum_w, CAST(SUM(h) AS BIGINT) AS sum_h,
       |  CAST(SUM(channels) AS BIGINT) AS sum_channels,
       |  CAST(SUM(rate) AS BIGINT) AS sum_rate_hz,
       |  CAST(SUM(CASE WHEN format = 'wav'
       |    THEN (data_size * 1000) // (rate * channels * 2) ELSE 0 END) AS BIGINT) AS sum_duration_ms
       |FROM m GROUP BY format ORDER BY format""".stripMargin

  /** DuckDB mirror of [[pipelineMetrics]] minus the rolling checksum (a
    * per-byte fold — left to the sbt determinism test): the blob generator is
    * pure id arithmetic, so counts, sizes, post-resize dims, and the
    * first-body-byte probe (one 64-bit LCG step, HUGEINT modular math) are
    * all re-derivable in SQL from generate_series alone.
    */
  def pipelineMetricsSql(n: Long): String =
    s"""WITH ids AS (
       |  SELECT unnest(generate_series(0, ${n - 1})) AS id
       |), m AS (
       |  SELECT id,
       |    CASE WHEN id % 3 = 0 THEN 'audio' ELSE 'image' END AS kind,
       |    id % 64 + 8 AS w, id % 48 + 8 AS h,
       |    CAST((CAST(id AS HUGEINT) * 6364136223846793005 + 1442695040888963407)
       |         % 18446744073709551616 AS HUGEINT) AS x0
       |  FROM ids
       |), sized AS (
       |  SELECT id, kind,
       |    12 + (w * h) % 4096 AS n_bytes,
       |    CASE WHEN w <= 32 AND h <= 32 THEN w
       |         ELSE GREATEST(1, CAST(floor(w * (32.0 / GREATEST(w, h))) AS BIGINT)) END AS w2,
       |    CASE WHEN w <= 32 AND h <= 32 THEN h
       |         ELSE GREATEST(1, CAST(floor(h * (32.0 / GREATEST(w, h))) AS BIGINT)) END AS h2,
       |    CASE WHEN 12 + (w * h) % 4096 > 12
       |         THEN CAST(x0 // 72057594037927936 AS BIGINT) ELSE -1 END AS head
       |  FROM m
       |)
       |SELECT kind, COUNT(*) AS n_media, CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
       |  CAST(MAX(w2) AS INTEGER) AS max_w, CAST(MAX(h2) AS INTEGER) AS max_h,
       |  CAST(SUM(head) AS BIGINT) AS sum_head
       |FROM sized GROUP BY kind ORDER BY kind""".stripMargin
}
