package graft.format

import java.io.IOException

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

import graft.sources.CsvPayload

/** Directory-level pruning manifest (`_graft_manifest`) — the FILE-granular
  * analog of the per-block stats segment, and the 100-TB analog of
  * partition pruning for NON-partition keys.
  *
  * Block pruning happens executor-side per file: a selective scan over a
  * 10k-file directory still launches a task per file just to discover that
  * every block refutes. The manifest moves that first refutation level to
  * the DRIVER: one sidecar file holds, per data file, the aggregate of its
  * per-block stats (line/null counts, zone bounds with string-truncation
  * exactness, unioned value dictionaries), keyed by `(relative path, length,
  * modification time)`. [[graft.sources.ManifestFileIndex]] consults it in
  * `FileIndex.listFiles` and drops fully-refuted FILES before task launch —
  * tasks become proportional to surviving files, not directory size.
  *
  * Degradation is structural, never wrong: a file with no matching entry
  * (new file, rewritten file, stale manifest) is always KEPT; a missing or
  * corrupt manifest disables pruning entirely; pruning uses the same
  * [[McStatsPruning.keepBlocks]] logic as block pruning (one synthetic
  * "block" per file), so Spark's re-evaluation of every pushed filter above
  * the scan bounds the blast radius of any bug to lost efficiency.
  *
  * Layout (all integers big-endian):
  * {{{
  * magic "4MCM"(4) version(4)=2 nFiles(4)
  * per file:
  *   pathLen(2) path(UTF-8, relative to the manifest's directory)
  *   fileLen(8) modTime(8)
  *   nCols(2) tag(1)×nCols
  *   lineCountExact(8) — the file's exact owned-line total (v2: feeds the
  *   zero-task COUNT(*) rewrite); the per-column pruning arrays saturate
  *   to Int.MaxValue/2 (only zero / non-zero matter there): lineCount(4)
  *   per col: nullCount(4) flags(1)
  *            [bounds: string → minLen(1) minBytes maxLen(1) maxBytes
  *                     else   → min(8) max(8)]
  *            [dict: count(1) then len(1)+bytes × count]
  * xxhash32(4) over everything before it
  * }}}
  */
object McManifest {
  val FileName = "_graft_manifest"
  val Magic: Int = 0x344d434d // "4MCM"
  // v3 (r17) appends per-file FILE-level bloom filters (lifted from v2 bloom
  // segments, [[BlockBlooms.BloomVersionFile]]) after each entry's columns:
  // `nBloomCols(1)` then per column `colIdx(2) nBuckets(4) buckets` — the
  // driver-side refutation for POINT lookups and denylist probes on
  // unsorted high-cardinality keys, where zone maps and dictionaries can't
  // help. v2 manifests parse bloom-less; v3 is always written.
  val Version: Int = 3
  private val VersionMin: Int = 2
  private val SatCap: Int = Int.MaxValue / 2

  // col flags (mirroring BlockStats semantics)
  private val FBounds = 1
  private val FMinExact = 2
  private val FMaxExact = 4
  private val FDict = 16

  /** Aggregated summary of one data file. Arrays are per column. */
  final case class FileEntry(
      path: String, // relative to the manifest dir
      fileLen: Long,
      modTime: Long,
      tags: Array[Int],
      lineCountExact: Long, // exact owned-line total (drives COUNT(*) pushdown)
      lineCount: Int, // saturated; zero iff the file owns no lines
      nullCount: Array[Int], // saturated with non-null preservation
      hasBounds: Array[Boolean],
      minLong: Array[Long],
      maxLong: Array[Long],
      minBytes: Array[Array[Byte]],
      maxBytes: Array[Array[Byte]],
      minExact: Array[Boolean],
      maxExact: Array[Boolean],
      dicts: Array[Array[Array[Byte]]], // null = none
      // v3: file-level blooms — parallel arrays over the file's bloom
      // columns (schema ordinals); words null iff nBuckets <= 0
      bloomCols: Array[Int] = Array.empty,
      bloomBuckets: Array[Int] = Array.empty,
      bloomWords: Array[Array[Int]] = Array.empty
  )

  /** Parsed manifest: entries grouped by tag vector, each group pre-built
    * as an [[McBlockStats]] with one "block" per file so pruning reuses
    * [[McStatsPruning.keepBlocks]] verbatim.
    */
  final class Manifest(val entries: Seq[FileEntry]) {
    /** (path, len, modTime) → ordinal for exact staleness matching. */
    val byKey: Map[(String, Long, Long), FileEntry] =
      entries.map(e => ((e.path, e.fileLen, e.modTime), e)).toMap

    /** Tag-vector groups (mixed-generation dirs evolve schemas): one
      * synthetic stats object per group — one "block" per file — plus (v3)
      * a synthetic bloom object mapping each file's FILE-level filters into
      * the per-block slots, so [[McStatsPruning.keepBlocks]]'s zone + bloom
      * composition prunes files exactly as it prunes blocks.
      */
    val groups: Seq[(Seq[FileEntry], McBlockStats, Option[McBlockBlooms])] =
      entries.groupBy(_.tags.toSeq).toSeq.map { case (_, es) =>
        val nCols = es.head.tags.length
        val n = es.length
        val nulls = new Array[Int](n * nCols)
        val bounds = new Array[Boolean](n * nCols)
        val minL = new Array[Long](n * nCols)
        val maxL = new Array[Long](n * nCols)
        val minB = new Array[Array[Byte]](n * nCols)
        val maxB = new Array[Array[Byte]](n * nCols)
        val minX = new Array[Boolean](n * nCols)
        val maxX = new Array[Boolean](n * nCols)
        val dicts = new Array[Array[Array[Byte]]](n * nCols)
        val lines = new Array[Int](n)
        val first = new Array[Int](n)
        var i = 0
        while (i < n) {
          val e = es(i)
          lines(i) = e.lineCount
          first(i) = if (e.lineCount > 0) 0 else BlockStats.NoOwnedLines
          var c = 0
          while (c < nCols) {
            val k = i * nCols + c
            nulls(k) = e.nullCount(c)
            bounds(k) = e.hasBounds(c)
            minL(k) = e.minLong(c); maxL(k) = e.maxLong(c)
            minB(k) = e.minBytes(c); maxB(k) = e.maxBytes(c)
            minX(k) = e.minExact(c); maxX(k) = e.maxExact(c)
            dicts(k) = e.dicts(c)
            c += 1
          }
          i += 1
        }
        val blooms: Option[McBlockBlooms] = {
          val colsUnion = es.flatMap(_.bloomCols).distinct.sorted.toArray
          if (colsUnion.isEmpty) None
          else {
            val nc = colsUnion.length
            val nb = new Array[Int](n * nc)
            val off = new Array[Int](n * nc)
            val buf = scala.collection.mutable.ArrayBuffer.empty[Int]
            var fi = 0
            while (fi < n) {
              val e = es(fi)
              var cj = 0
              while (cj < nc) {
                val k = fi * nc + cj
                val pos = e.bloomCols.indexOf(colsUnion(cj))
                if (pos < 0) nb(k) = -1 // this file carries no filter: keep
                else {
                  nb(k) = e.bloomBuckets(pos)
                  off(k) = buf.length
                  if (nb(k) > 0) buf ++= e.bloomWords(pos)
                }
                cj += 1
              }
              fi += 1
            }
            Some(new McBlockBlooms(colsUnion, nb, off, buf.toArray))
          }
        }
        (es.toSeq, new McBlockStats(es.head.tags, first, lines, nulls, bounds,
          minL, maxL, minB, maxB, minX, maxX, dicts = dicts), blooms)
      }
  }

  @inline private def sat(v: Long): Int = math.min(v, SatCap.toLong).toInt

  /** Aggregate one file's per-block stats (and v2 bloom segment, when
    * present) into a manifest entry.
    */
  def summarize(path: String, fileLen: Long, modTime: Long, st: McBlockStats,
      blooms: Option[McBlockBlooms] = None): FileEntry = {
    val nCols = st.nCols
    val nB = st.nBlocks
    var lineTotal = 0L
    var b = 0
    while (b < nB) { lineTotal += st.lineCount(b); b += 1 }
    val nulls = new Array[Int](nCols)
    val hasB = new Array[Boolean](nCols)
    val minL = new Array[Long](nCols)
    val maxL = new Array[Long](nCols)
    val minBy = new Array[Array[Byte]](nCols)
    val maxBy = new Array[Array[Byte]](nCols)
    val minX = new Array[Boolean](nCols)
    val maxX = new Array[Boolean](nCols)
    val dicts = new Array[Array[Array[Byte]]](nCols)
    var c = 0
    while (c < nCols) {
      val tag = st.tags(c)
      val isStr = tag == CsvPayload.TagString
      val isDbl = tag == CsvPayload.TagDouble || tag == CsvPayload.TagFloat
      var nullTotal = 0L
      var nonNullTotal = 0L
      var bounded = false
      var poisoned = false // some value-bearing block lacks bounds (NaN, …)
      var mnL = 0L; var mxL = 0L
      var mnB: Array[Byte] = null; var mxB: Array[Byte] = null
      var mnExactWitness = false // ∃ exact block whose stored min == winner
      var mxExactWitness = false
      var mxInexactTie = false // ∃ inexact block whose stored max == winner
      var dictOk = true
      val dictUnion = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      b = 0
      while (b < nB) {
        val k = b * nCols + c
        nullTotal += st.nullCount(k)
        val nonNull = st.lineCount(b) - st.nullCount(k)
        nonNullTotal += math.max(nonNull, 0)
        if (nonNull > 0) {
          if (!st.hasBounds(k)) poisoned = true
          else if (isStr) {
            val bMin = st.minBytes(k); val bMax = st.maxBytes(k)
            if (mnB == null || McStatsPruning.byteCompare(bMin, mnB) < 0) {
              mnB = bMin; mnExactWitness = st.minExact(k)
            } else if (McStatsPruning.byteCompare(bMin, mnB) == 0 && st.minExact(k))
              mnExactWitness = true
            val cmpMax = if (mxB == null) 1 else McStatsPruning.byteCompare(bMax, mxB)
            if (cmpMax > 0) {
              mxB = bMax; mxExactWitness = st.maxExact(k); mxInexactTie = !st.maxExact(k)
            } else if (cmpMax == 0) {
              if (st.maxExact(k)) mxExactWitness = true else mxInexactTie = true
            }
          } else if (isDbl) {
            val bMin = java.lang.Double.longBitsToDouble(st.minLong(k))
            val bMax = java.lang.Double.longBitsToDouble(st.maxLong(k))
            if (!bounded || bMin < java.lang.Double.longBitsToDouble(mnL))
              mnL = st.minLong(k)
            if (!bounded || bMax > java.lang.Double.longBitsToDouble(mxL))
              mxL = st.maxLong(k)
          } else {
            if (!bounded || st.minLong(k) < mnL) mnL = st.minLong(k)
            if (!bounded || st.maxLong(k) > mxL) mxL = st.maxLong(k)
          }
          bounded = true
          // dict union: complete membership needs EVERY value-bearing block
          // to carry a complete dictionary, and the union to stay small
          if (dictOk && isStr) {
            val d = st.dictAt(k)
            if (d == null) dictOk = false
            else {
              var j = 0
              while (dictOk && j < d.length) {
                val v = d(j)
                if (!dictUnion.exists(u => java.util.Arrays.equals(u, v))) {
                  if (dictUnion.length >= BlockStats.DictMaxEntries) dictOk = false
                  else dictUnion += v
                }
                j += 1
              }
            }
          }
        }
        b += 1
      }
      nulls(c) = if (nonNullTotal == 0L) -1 else sat(nullTotal) // -1 = all-null marker, fixed below
      hasB(c) = bounded && !poisoned
      if (hasB(c)) {
        if (isStr) {
          minBy(c) = mnB; maxBy(c) = mxB
          minX(c) = mnExactWitness
          maxX(c) = mxExactWitness && !mxInexactTie
        } else { minL(c) = mnL; maxL(c) = mxL }
      }
      dicts(c) =
        if (isStr && dictOk && dictUnion.nonEmpty && nonNullTotal > 0) dictUnion.toArray
        else null
      c += 1
    }
    // Saturation (files beyond ~10^9 lines): pruning only ever asks
    // `lineCount - nullCount > 0` and `nullCount > 0`, so preserve both
    // signs per column — all-null columns keep nullCount == lineCount
    // (marked -1 above), value-bearing columns keep nullCount strictly
    // below lineCount with the zero/non-zero of the true null count.
    val lineSat = sat(lineTotal)
    var c2 = 0
    while (c2 < nCols) {
      if (nulls(c2) == -1) nulls(c2) = lineSat // truly all-null column
      else if (nulls(c2) >= lineSat) nulls(c2) = lineSat - 1 // keep non-nulls visible
      c2 += 1
    }
    // file-level blooms (v2 bloom segments): lift each PRESENT filter; an
    // absent one (file outgrew the fixed size) is simply omitted — readers
    // keep files they have no filter for
    val (bCols, bNbs, bWs) = blooms match {
      case Some(bl) if bl.fileNBuckets.nonEmpty =>
        val cs = scala.collection.mutable.ArrayBuffer.empty[Int]
        val nbs = scala.collection.mutable.ArrayBuffer.empty[Int]
        val ws = scala.collection.mutable.ArrayBuffer.empty[Array[Int]]
        var ord = 0
        while (ord < bl.nCols) {
          bl.fileBloomOf(ord).foreach { case (nb, words) =>
            cs += bl.colIdx(ord); nbs += nb; ws += (if (nb > 0) words else null)
          }
          ord += 1
        }
        (cs.toArray, nbs.toArray, ws.toArray)
      case _ => (Array.empty[Int], Array.empty[Int], Array.empty[Array[Int]])
    }
    FileEntry(path, fileLen, modTime, st.tags, lineTotal, lineSat,
      nulls, hasB, minL, maxL, minBy, maxBy, minX, maxX, dicts, bCols, bNbs, bWs)
  }

  // --- serialization ---------------------------------------------------

  def serialize(entries: Seq[FileEntry]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(256 + entries.length * 256)
    def w2(v: Int): Unit = { bos.write((v >>> 8) & 0xff); bos.write(v & 0xff) }
    def w4(v: Int): Unit = {
      bos.write((v >>> 24) & 0xff); bos.write((v >>> 16) & 0xff)
      bos.write((v >>> 8) & 0xff); bos.write(v & 0xff)
    }
    def w8(v: Long): Unit = { w4((v >>> 32).toInt); w4(v.toInt) }
    w4(Magic); w4(Version); w4(entries.length)
    entries.foreach { e =>
      val pb = e.path.getBytes("UTF-8")
      require(pb.length <= 0xffff, s"manifest path too long: ${e.path}")
      w2(pb.length); bos.write(pb, 0, pb.length)
      w8(e.fileLen); w8(e.modTime)
      require(e.tags.length <= 4096)
      w2(e.tags.length); e.tags.foreach(bos.write)
      w8(e.lineCountExact)
      w4(e.lineCount)
      var c = 0
      while (c < e.tags.length) {
        w4(e.nullCount(c))
        var flags = 0
        if (e.hasBounds(c)) {
          flags |= FBounds
          if (e.minExact(c)) flags |= FMinExact
          if (e.maxExact(c)) flags |= FMaxExact
        }
        if (e.dicts(c) != null) flags |= FDict
        bos.write(flags)
        if (e.hasBounds(c)) {
          if (e.tags(c) == CsvPayload.TagString) {
            bos.write(e.minBytes(c).length); bos.write(e.minBytes(c), 0, e.minBytes(c).length)
            bos.write(e.maxBytes(c).length); bos.write(e.maxBytes(c), 0, e.maxBytes(c).length)
          } else { w8(e.minLong(c)); w8(e.maxLong(c)) }
        }
        if (e.dicts(c) != null) {
          bos.write(e.dicts(c).length)
          e.dicts(c).foreach { v => bos.write(v.length); bos.write(v, 0, v.length) }
        }
        c += 1
      }
      // v3: file-level blooms
      require(e.bloomCols.length <= 255)
      bos.write(e.bloomCols.length)
      var bc = 0
      while (bc < e.bloomCols.length) {
        w2(e.bloomCols(bc))
        w4(e.bloomBuckets(bc))
        if (e.bloomBuckets(bc) > 0) e.bloomWords(bc).foreach(w4)
        bc += 1
      }
    }
    val body = bos.toByteArray
    val out = java.util.Arrays.copyOf(body, body.length + 4)
    val h = FourMc.xxhash32(body, 0, body.length)
    out(body.length) = ((h >>> 24) & 0xff).toByte
    out(body.length + 1) = ((h >>> 16) & 0xff).toByte
    out(body.length + 2) = ((h >>> 8) & 0xff).toByte
    out(body.length + 3) = (h & 0xff).toByte
    out
  }

  /** Parse manifest bytes; None on unknown version; throws on corruption. */
  def parse(bytes: Array[Byte]): Option[Manifest] = {
    if (bytes.length < 16) throw new IOException("4mc manifest too short")
    val h = FourMc.xxhash32(bytes, 0, bytes.length - 4)
    val want = ((bytes(bytes.length - 4) & 0xff) << 24) | ((bytes(bytes.length - 3) & 0xff) << 16) |
      ((bytes(bytes.length - 2) & 0xff) << 8) | (bytes(bytes.length - 1) & 0xff)
    if (h != want) throw new IOException("4mc manifest checksum mismatch")
    var p = 0
    def r2(): Int = { val v = ((bytes(p) & 0xff) << 8) | (bytes(p + 1) & 0xff); p += 2; v }
    def r4(): Int = {
      val v = ((bytes(p) & 0xff) << 24) | ((bytes(p + 1) & 0xff) << 16) |
        ((bytes(p + 2) & 0xff) << 8) | (bytes(p + 3) & 0xff)
      p += 4; v
    }
    def r8(): Long = { val hi = r4().toLong; val lo = r4().toLong & 0xffffffffL; (hi << 32) | lo }
    if (r4() != Magic) throw new IOException("4mc manifest magic mismatch")
    val version = r4()
    if (version < VersionMin || version > Version) return None
    val nFiles = r4()
    if (nFiles < 0 || nFiles > (1 << 24)) throw new IOException(s"4mc manifest nFiles $nFiles")
    val entries = (0 until nFiles).map { _ =>
      val pl = r2()
      val path = new String(bytes, p, pl, "UTF-8"); p += pl
      val fileLen = r8(); val modTime = r8()
      val nCols = r2()
      val tags = new Array[Int](nCols)
      var i = 0
      while (i < nCols) { tags(i) = bytes(p) & 0xff; p += 1; i += 1 }
      val lineCountExact = r8()
      val lineCount = r4()
      val nulls = new Array[Int](nCols)
      val hasB = new Array[Boolean](nCols)
      val minL = new Array[Long](nCols)
      val maxL = new Array[Long](nCols)
      val minBy = new Array[Array[Byte]](nCols)
      val maxBy = new Array[Array[Byte]](nCols)
      val minX = new Array[Boolean](nCols)
      val maxX = new Array[Boolean](nCols)
      val dicts = new Array[Array[Array[Byte]]](nCols)
      var c = 0
      while (c < nCols) {
        nulls(c) = r4()
        val flags = bytes(p) & 0xff; p += 1
        if ((flags & FBounds) != 0) {
          hasB(c) = true
          minX(c) = (flags & FMinExact) != 0
          maxX(c) = (flags & FMaxExact) != 0
          if (tags(c) == CsvPayload.TagString) {
            val ml = bytes(p) & 0xff; p += 1
            minBy(c) = java.util.Arrays.copyOfRange(bytes, p, p + ml); p += ml
            val xl = bytes(p) & 0xff; p += 1
            maxBy(c) = java.util.Arrays.copyOfRange(bytes, p, p + xl); p += xl
          } else { minL(c) = r8(); maxL(c) = r8() }
        }
        if ((flags & FDict) != 0) {
          val cnt = bytes(p) & 0xff; p += 1
          val d = new Array[Array[Byte]](cnt)
          var j = 0
          while (j < cnt) {
            val l = bytes(p) & 0xff; p += 1
            d(j) = java.util.Arrays.copyOfRange(bytes, p, p + l); p += l
            j += 1
          }
          dicts(c) = d
        }
        c += 1
      }
      var bCols = Array.empty[Int]
      var bNbs = Array.empty[Int]
      var bWs = Array.empty[Array[Int]]
      if (version >= 3) {
        val nBl = bytes(p) & 0xff; p += 1
        if (nBl > 0) {
          bCols = new Array[Int](nBl)
          bNbs = new Array[Int](nBl)
          bWs = new Array[Array[Int]](nBl)
          var bc = 0
          while (bc < nBl) {
            bCols(bc) = r2()
            val nb = r4()
            if (nb < -1 || nb > (1 << 20))
              throw new IOException(s"4mc manifest bloom bucket count $nb out of range")
            bNbs(bc) = nb
            if (nb > 0) {
              val w = new Array[Int](nb * 8)
              var wi = 0
              while (wi < w.length) { w(wi) = r4(); wi += 1 }
              bWs(bc) = w
            }
            bc += 1
          }
        }
      }
      FileEntry(path, fileLen, modTime, tags, lineCountExact, lineCount, nulls, hasB,
        minL, maxL, minBy, maxBy, minX, maxX, dicts, bCols, bNbs, bWs)
    }
    Some(new Manifest(entries))
  }

  // --- write / merge ----------------------------------------------------

  /** Build (or incrementally refresh) the manifest for `dir`: every
    * `.4mc`/`.4mz` file under it (recursive — partitioned layouts included)
    * gets an entry from its footer stats, reusing existing entries whose
    * `(path, len, modTime)` still match so steady-state refreshes read only
    * NEW files' footers. Files without a stats segment are omitted (they
    * are always kept by readers). Returns the number of entries written.
    */
  def write(dir: String, conf: Configuration): Int = {
    val root = new Path(dir)
    val fs = root.getFileSystem(conf) match {
      case cfs: org.apache.hadoop.fs.ChecksumFileSystem => cfs.getRawFileSystem
      case other                                        => other
    }
    val existing: Map[(String, Long, Long), FileEntry] =
      try {
        val mPath = new Path(root, FileName)
        if (fs.exists(mPath)) {
          val len = fs.getFileStatus(mPath).getLen
          val buf = new Array[Byte](len.toInt)
          val in = fs.open(mPath)
          try in.readFully(0, buf) finally in.close()
          parse(buf).map(_.byKey).getOrElse(Map.empty)
        } else Map.empty
      } catch { case scala.util.control.NonFatal(_) => Map.empty }
    val rootUri = fs.makeQualified(root).toUri
    val it = fs.listFiles(root, true)
    val entries = scala.collection.mutable.ArrayBuffer.empty[FileEntry]
    while (it.hasNext) {
      val st = it.next()
      val name = st.getPath.getName
      if (st.isFile && (name.endsWith(".4mc") || name.endsWith(".4mz"))) {
        val rel = rootUri.relativize(fs.makeQualified(st.getPath).toUri).getPath
        // Skip any path with a hidden COMPONENT ('_'/'.' prefix), matching
        // Spark's InMemoryFileIndex path filter — the recursive listing
        // descends into _temporary/.staging dirs, and a refresh racing an
        // in-flight write must not record uncommitted task-attempt files as
        // permanent stale entries (r16 advice).
        if (!rel.split('/').exists(s => s.startsWith("_") || s.startsWith(".")))
          addEntry(fs, st, rel, existing, entries)
      }
    }
    val bytes = serialize(entries.toSeq)
    val tmp = new Path(root, s".$FileName.tmp")
    val out = fs.create(tmp, true)
    try out.write(bytes) finally out.close()
    if (!fs.rename(tmp, new Path(root, FileName))) {
      fs.delete(new Path(root, FileName), false)
      if (!fs.rename(tmp, new Path(root, FileName)))
        throw new IOException(s"4mc manifest: cannot move $tmp into place")
    }
    entries.length
  }

  private def addEntry(
      fs: FileSystem,
      st: org.apache.hadoop.fs.FileStatus,
      rel: String,
      existing: Map[(String, Long, Long), FileEntry],
      entries: scala.collection.mutable.ArrayBuffer[FileEntry]): Unit = {
    val key = (rel, st.getLen, st.getModificationTime)
    existing.get(key) match {
      case Some(e) => entries += e
      case None =>
        try {
          val stream = fs.open(st.getPath)
          val in = new McInput {
            def length: Long = st.getLen
            def readFully(pos: Long, buf: Array[Byte], off: Int, n: Int): Unit =
              stream.readFully(pos, buf, off, n)
            def close(): Unit = stream.close()
          }
          try {
            val idx = FourMcReader.readIndex(in)
            idx.stats.foreach { s =>
              entries += summarize(rel, st.getLen, st.getModificationTime, s, idx.blooms)
            }
          } finally stream.close()
        } catch {
          case scala.util.control.NonFatal(_) => // unreadable: omit (kept by readers)
        }
    }
  }
}
