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
