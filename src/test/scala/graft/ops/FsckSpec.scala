package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Distributed fsck: clean dirs report clean, payload corruption is
  * localized to the right file and counted per block, footer damage is a
  * file-level report rather than a sweep failure.
  */
class FsckSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]").appName("fsck-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private def freshDir(): String = {
    val d = Files.createTempDirectory("fsck").toFile
    d.delete(); d.getAbsolutePath
  }

  test("clean, payload-corrupt, and footer-corrupt files each report correctly") {
    import spark.implicits._
    val dir = freshDir()
    val lines = (0 until 40000).map(i => f"line-$i%06d|${"q" * 30}")
    lines.toDF("value").repartition(3).write.format("4mc")
      .option("codec", "lz4-fast").save(dir)

    val clean = Fsck.fsck(spark, dir).collect()
    assert(clean.length == 3)
    assert(clean.forall(r => r.getBoolean(2) && r.getInt(4) == 0),
      s"clean dir must fsck clean: ${clean.mkString("; ")}")
    val totalBlocks = clean.map(_.getInt(3)).sum
    assert(totalBlocks >= 3)

    // corrupt one payload byte in file 0, and the footer magic in file 1
    val files = new java.io.File(dir).listFiles
      .filter(_.getName.endsWith(".4mc")).sortBy(_.getName)
    val in0 = graft.format.McInput.local(files(0).toPath)
    val idx0 = try graft.format.FourMcReader.readIndex(in0) finally in0.close()
    val raf0 = new java.io.RandomAccessFile(files(0), "rw")
    try {
      raf0.seek(idx0.blockOffsets(0) + 12 + 3)
      val b = raf0.read(); raf0.seek(idx0.blockOffsets(0) + 12 + 3); raf0.write(b ^ 0x10)
    } finally raf0.close()
    val raf1 = new java.io.RandomAccessFile(files(1), "rw")
    try {
      raf1.seek(files(1).length() - 6) // inside the footer magic/checksum tail
      val b = raf1.read(); raf1.seek(files(1).length() - 6); raf1.write(b ^ 0x10)
    } finally raf1.close()

    val swept = Fsck.fsck(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    val r0 = swept.keys.find(_.endsWith(files(0).getName)).map(swept).get
    val r1 = swept.keys.find(_.endsWith(files(1).getName)).map(swept).get
    val r2 = swept.keys.find(_.endsWith(files(2).getName)).map(swept).get
    assert(r0.getBoolean(2) && r0.getInt(4) == 1, s"file0: $r0")
    // on local fs Hadoop's own CRC layer may flag the damage before our
    // xxhash does ("Checksum error"); both are checksum-class reports
    assert(r0.getString(5).toLowerCase.contains("checksum"), s"file0 error: ${r0.getString(5)}")
    assert(!r1.getBoolean(2), s"file1 must report a bad footer: $r1")
    assert(r2.getBoolean(2) && r2.getInt(4) == 0, s"file2 must stay clean: $r2")
  }

  test("manifest sidecar: validated, stale entries counted, corruption surfaced") {
    import spark.implicits._
    val dir = freshDir()
    (0 until 5000).map(i => (i.toLong, f"m-$i%05d")).toDF("k", "v")
      .repartition(3).write.format("4mc").option("payload", "csv").save(dir)
    graft.format.McManifest.write(dir, spark.sessionState.newHadoopConf())
    def manifestRow() = Fsck.fsck(spark, dir).collect()
      .find(_.getString(0).endsWith(graft.format.McManifest.FileName)).get
    val fresh = manifestRow()
    assert(fresh.getBoolean(2) && fresh.getInt(3) == 3 && fresh.getInt(4) == 0,
      s"fresh manifest must report 3 entries, 0 stale: $fresh")
    // delete a data file without refreshing: its entry goes stale
    val victim = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".4mc")).head
    assert(victim.delete())
    val stale = manifestRow()
    assert(stale.getBoolean(2) && stale.getInt(4) == 1, s"one stale entry expected: $stale")
    // corrupt the manifest: unreadable, data files still fsck clean
    val mf = new java.io.File(dir, graft.format.McManifest.FileName)
    val bytes = java.nio.file.Files.readAllBytes(mf.toPath)
    bytes(12) = (bytes(12) ^ 0x55).toByte
    java.nio.file.Files.write(mf.toPath, bytes)
    val rep = Fsck.fsck(spark, dir).collect()
    val bad = rep.find(_.getString(0).endsWith(graft.format.McManifest.FileName)).get
    assert(!bad.getBoolean(2) && bad.getString(5).nonEmpty)
    assert(rep.filterNot(_ eq bad).forall(_.getBoolean(2)))
  }

  test("corrupt bloom/stats segments surface as unreadable metadata, payload still clean") {
    import org.apache.spark.sql.types._
    val dir = freshDir()
    val schema = StructType(Seq(StructField("k", LongType), StructField("s", StringType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(0L until 50000L, 1)
        .map(i => org.apache.spark.sql.Row(i, "w" * 30)), schema)
      .coalesce(1).write.format("4mc").option("payload", "csv")
      .option("bloomColumns", "k").save(dir)
    val f = new java.io.File(dir).listFiles.filter(_.getName.endsWith(".4mc")).head
    val in = graft.format.McInput.local(f.toPath)
    val (eosPos, hasBoth) = try {
      val idx = graft.format.FourMcReader.readIndex(in)
      (idx.eosPos, idx.stats.isDefined && idx.blooms.isDefined)
    } finally in.close()
    assert(hasBoth, "fixture must carry bloom + stats segments")
    // flip one byte INSIDE the bloom segment (just past the EOS marker):
    // the segment checksum must catch it — readIndex throws, fsck reports
    // the file as unreadable metadata rather than silently mis-pruning
    val raf = new java.io.RandomAccessFile(f, "rw")
    try {
      raf.seek(eosPos + 12 + 40)
      val b = raf.read(); raf.seek(eosPos + 12 + 40); raf.write(b ^ 0x01)
    } finally raf.close()
    val report = Fsck.fsck(spark, dir).collect().head
    assert(!report.getBoolean(2), s"corrupt bloom segment must flag the file: $report")
    // on local fs Hadoop's CRC sidecar may flag the byte before our segment
    // checksum does; both are checksum-class reports. The segment's own
    // xxhash is pinned directly below, CRC layer bypassed.
    assert(report.getString(5).toLowerCase.contains("checksum"),
      s"error should be checksum-class: ${report.getString(5)}")
    // direct (CRC-free) read: the BLOOM segment checksum itself must throw
    val rawIn = graft.format.McInput.local(f.toPath)
    try {
      val e = intercept[java.io.IOException](graft.format.FourMcReader.readIndex(rawIn))
      assert(e.getMessage.toLowerCase.contains("bloom"),
        s"segment checksum should name the bloom segment: ${e.getMessage}")
    } finally rawIn.close()
  }

  test("shrunken comp field with a recomputed checksum is caught by exact contiguity") {
    import graft.format.{FourMc, FourMcReader, FourMcWriter, McCodec, McInput}
    val dir = freshDir()
    new java.io.File(dir).mkdirs()
    val f = new java.io.File(dir, "part-contig.4mc")
    // Write directly (no Hadoop .crc sidecar) so fsck's own walk does the
    // detecting, not the local filesystem's CRC layer.
    val w = new FourMcWriter(Files.newOutputStream(f.toPath), McCodec.Lz4Fast)
    val data = (0 until 20000).map(i => s"row-$i").mkString("\n").getBytes("UTF-8")
    var off = 0
    while (off < data.length) {
      val n = math.min(32 * 1024, data.length - off)
      w.write(data, off, n); w.flushBlock(); off += n
    }
    w.close()
    val in = McInput.local(f.toPath)
    val idx = try FourMcReader.readIndex(in) finally in.close()
    assert(idx.numBlocks >= 2)
    // Shrink block 0's comp by 4 bytes and RECOMPUTE its checksum over the
    // truncated payload: every per-field sanity check passes, only the
    // footer-index contiguity equation can catch it.
    val bytes = Files.readAllBytes(f.toPath)
    val h = idx.blockOffsets(0).toInt
    def be(o: Int): Int =
      ((bytes(o) & 0xff) << 24) | ((bytes(o + 1) & 0xff) << 16) |
        ((bytes(o + 2) & 0xff) << 8) | (bytes(o + 3) & 0xff)
    def putBE(o: Int, v: Int): Unit = {
      bytes(o) = (v >>> 24).toByte; bytes(o + 1) = (v >>> 16).toByte
      bytes(o + 2) = (v >>> 8).toByte; bytes(o + 3) = v.toByte
    }
    val comp = be(h + 4)
    assert(comp > 8)
    putBE(h + 4, comp - 4)
    putBE(h + 8, FourMc.xxhash32(bytes, h + FourMc.BlockHeaderLen, comp - 4))
    Files.write(f.toPath, bytes)

    val swept = Fsck.fsck(spark, dir).collect()
    assert(swept.length == 1)
    val r = swept.head
    assert(r.getBoolean(2), s"footer must still parse: $r")
    assert(r.getInt(4) == 1, s"exactly the shrunken block must be flagged: $r")
    assert(r.getString(5).contains("index expects"), s"error should cite contiguity: ${r.getString(5)}")
  }
}
