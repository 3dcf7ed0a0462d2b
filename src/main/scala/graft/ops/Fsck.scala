package graft.ops

import graft.format.{FourMc, FourMcReader, McCodec, McInput}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Distributed integrity sweep over a directory of 4mc/4mz files — the
  * periodic fsck a 100 TB archive runs between the writer's checksums and
  * the reader's `ignoreCorruptBlocks` recovery.
  *
  * Per file: verify the header, the footer (magic/size/version/checksum,
  * via the normal index read), and EVERY block's xxhash32 over its
  * compressed payload — WITHOUT decompressing anything (except the tiny
  * dictionary streams of columnar blocks, whose entry/code structure
  * selective readers trust), so the sweep is pure sequential I/O (~the
  * file's on-disk size), not codec CPU. Block
  * structure errors (sizes out of range, premature EOS vs the index) count
  * as corrupt too.
  *
  * Shape at scale: one task per FILE (files are the natural unit — each
  * needs its own footer), listed driver-side (names only) and fanned out
  * with `spark.sparkContext.parallelize`; no shuffle, output one row per
  * file. Unreadable files (bad header/footer) surface as rows with
  * `footer_ok = false` rather than failing the sweep.
  */
object Fsck {

  final case class FileReport(
      file: String,
      bytes: Long,
      footer_ok: Boolean,
      n_blocks: Int,
      n_corrupt_blocks: Int,
      error: String)

  def fsck(spark: SparkSession, dir: String, parallelism: Int = 0): DataFrame = {
    import spark.implicits._
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val filesFull = {
      val it = fs.listFiles(root, true)
      val b = Seq.newBuilder[(String, Long, Long)]
      while (it.hasNext) {
        val st = it.next()
        val n = st.getPath.getName
        if ((n.endsWith(".4mc") || n.endsWith(".4mz")) && !n.startsWith("_") && !n.startsWith("."))
          b += ((st.getPath.toString, st.getLen, st.getModificationTime))
      }
      b.result()
    }
    val files = filesFull.map { case (p, l, _) => (p, l) }
    // the directory pruning manifest, when present, gets its own report
    // row: checksum/parse validation plus a STALE-entry count (entries
    // whose (path, len, modTime) no longer matches a listed file — those
    // are dead weight, never consulted, but flag a missed refresh)
    val manifestRows: Seq[FileReport] = {
      val mPath = new org.apache.hadoop.fs.Path(root, graft.format.McManifest.FileName)
      if (!fs.exists(mPath)) Nil
      else {
        val st = fs.getFileStatus(mPath)
        try {
          val buf = new Array[Byte](st.getLen.toInt)
          val in = fs.open(mPath)
          try in.readFully(0, buf) finally in.close()
          graft.format.McManifest.parse(buf) match {
            case Some(m) =>
              val rootUri = fs.makeQualified(root).toUri
              val live = filesFull.map { case (p, l, t) =>
                (rootUri.relativize(new org.apache.hadoop.fs.Path(p).toUri).getPath, l, t)
              }.toSet
              val stale = m.entries.count(e => !live.contains((e.path, e.fileLen, e.modTime)))
              Seq(FileReport(mPath.toString, st.getLen, footer_ok = true,
                n_blocks = m.entries.length, n_corrupt_blocks = stale,
                error = if (stale == 0) "" else s"$stale stale entries (refresh the manifest)"))
            case None =>
              Seq(FileReport(mPath.toString, st.getLen, footer_ok = false, 0, 0,
                "unknown manifest version"))
          }
        } catch {
          case e: Exception =>
            Seq(FileReport(mPath.toString, st.getLen, footer_ok = false, 0, 0,
              s"manifest unreadable: ${e.getMessage}"))
        }
      }
    }
    val par = if (parallelism > 0) parallelism
      else math.max(1, math.min(files.size, spark.sparkContext.defaultParallelism))
    val confB = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    spark.sparkContext
      .parallelize(files, math.max(par, 1))
      .map { case (path, len) => checkFile(path, len, confB.value.value) }
      .toDF()
      .union(spark.createDataFrame(manifestRows))
      .orderBy($"file")
  }

  private[graft] def checkFile(path: String,
                               len: Long,
                               conf: org.apache.hadoop.conf.Configuration): FileReport = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val stream = fs.open(p)
    val in: McInput = new McInput {
      def length: Long = len
      def readFully(pos: Long, buf: Array[Byte], off: Int, n: Int): Unit =
        stream.readFully(pos, buf, off, n)
      def close(): Unit = stream.close()
    }
    try {
      val index =
        try FourMcReader.readIndex(in)
        catch {
          case e: Exception =>
            return FileReport(path, len, footer_ok = false, 0, 0,
              Option(e.getMessage).getOrElse(e.getClass.getSimpleName))
        }
      var corrupt = 0
      var firstErr: String = ""
      val hdr = new Array[Byte](FourMc.BlockHeaderLen)
      var ord = 0
      while (ord < index.numBlocks) {
        val off = index.blockOffsets(ord)
        val blockEnd =
          if (ord + 1 < index.numBlocks) index.blockOffsets(ord + 1) else index.eosPos
        try {
          in.readFully(off, hdr, 0, FourMc.BlockHeaderLen)
          def be(o: Int): Int =
            ((hdr(o) & 0xff) << 24) | ((hdr(o + 1) & 0xff) << 16) |
              ((hdr(o + 2) & 0xff) << 8) | (hdr(o + 3) & 0xff)
          val uncomp = be(0); val comp = be(4); val sum = be(8)
          if (uncomp == 0 && comp == 0 && sum == 0)
            throw new java.io.IOException(s"premature EOS at $off (index expects a block)")
          if (uncomp <= 0 || uncomp > FourMc.MaxBlockSize)
            throw new java.io.IOException(s"uncompressed size $uncomp out of range at $off")
          if (comp <= 0 || comp > uncomp)
            throw new java.io.IOException(s"compressed size $comp out of range at $off")
          // 4mc blocks are contiguous: the payload must end EXACTLY at the
          // next index offset. A corrupted comp smaller than the index gap
          // (with zero-padding or a colliding checksum) is as wrong as an
          // overrun, so enforce equality rather than just no-overrun.
          if (off + FourMc.BlockHeaderLen + comp != blockEnd)
            throw new java.io.IOException(
              s"block at $off ends at ${off + FourMc.BlockHeaderLen + comp}, index expects $blockEnd")
          val payload = new Array[Byte](comp)
          in.readFully(off + FourMc.BlockHeaderLen, payload, 0, comp)
          if (FourMc.xxhash32(payload, 0, comp) != sum)
            throw new java.io.IOException(s"block checksum mismatch at $off")
          // columnar payloads (stats layout byte): verify the directory's
          // structure AND each column stream's own checksum — a selective
          // reader trusts these per-stream sums, so fsck must too
          if (index.stats.exists(_.columnar)) {
            val nCols = index.stats.get.tags.length
            val dl = graft.format.ColumnarBlocks.dirLen(nCols)
            if (comp < dl)
              throw new java.io.IOException(s"columnar payload smaller than directory at $off")
            var o2 = dl
            var totalU = dl
            var c = 0
            while (c < nCols) {
              val e = c * graft.format.ColumnarBlocks.DirEntryLen
              val sLen = graft.format.ColumnarBlocks.getBE(payload, e)
              val uLenRaw = graft.format.ColumnarBlocks.getBE(payload, e + 4)
              val uLen = uLenRaw & ~graft.format.ColumnarBlocks.DictFlag
              val want = graft.format.ColumnarBlocks.getBE(payload, e + 8)
              if (sLen < 0 || uLen < 0 || sLen > uLen || o2 + sLen > comp)
                throw new java.io.IOException(s"columnar stream $c sizes out of range at $off")
              if (FourMc.xxhash32(payload, o2, sLen) != want)
                throw new java.io.IOException(s"columnar stream $c checksum mismatch at $off")
              // dict-encoded stream (r15): selective readers trust the
              // entry table + code bounds, so fsck validates the full
              // decoded structure (entries parse, every code in range)
              if ((uLenRaw & graft.format.ColumnarBlocks.DictFlag) != 0) {
                val data =
                  if (sLen == uLen) java.util.Arrays.copyOfRange(payload, o2, o2 + uLen)
                  else McCodec.decompress(index.zstd, payload, o2, sLen, uLen)
                new graft.format.ColumnarBlocks.DictStream(data, uLen, s"(stream $c at $off)")
              }
              o2 += sLen
              totalU += uLen
              c += 1
            }
            if (o2 != comp || totalU != uncomp)
              throw new java.io.IOException(s"columnar directory disagrees with block sizes at $off")
          }
        } catch {
          case e: Exception =>
            corrupt += 1
            if (firstErr.isEmpty)
              firstErr = Option(e.getMessage).getOrElse(e.getClass.getSimpleName)
        }
        ord += 1
      }
      FileReport(path, len, footer_ok = true, index.numBlocks, corrupt, firstErr)
    } finally in.close()
  }
}
