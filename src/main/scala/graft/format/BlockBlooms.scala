package graft.format

/** Optional per-block BLOOM-FILTER segment for csv-payload 4mc/4mz files —
  * the point-lookup complement of the zone-map stats segment
  * ([[BlockStats]]). Zone maps prune range predicates and sorted layouts;
  * they are useless for `WHERE key = K` (or a runtime key-set probe) over a
  * column UNCORRELATED with file order, where every block's [min, max] spans
  * the whole domain. A per-block bloom answers exactly that membership
  * question: at ~10 bits per distinct key it refutes ~99% of blocks for a
  * point lookup, turning a full-file decode into one or two block reads —
  * the shape that matters at 100 TB, where "find these 50 orderkeys in a
  * petabyte of logs" must not decompress the petabyte.
  *
  * Placement extends the container the same backward-compatible way the
  * stats segment does (see [[BlockStats]] for the detection argument):
  *
  * {{{
  * HEADER | BLOCK_1..N | EOS | [BLOOM] | [STATS] | FOOTER
  * BLOOM  = magic(4) version(4) nCols(4) colIdx(4)xC nBlocks(4)
  *          blockEntry xN totalLen(4) magic(4) xxhash32(preceding)(4)
  * blockEntry = colBloom xC
  * colBloom   = nBuckets(4)  [-1 = absent (over cap); 0 = no non-null keys;
  *              >0: nBuckets x 32-byte split-block bucket]
  * }}}
  *
  * The filter is a split-block bloom (SBBF) as specified publicly by
  * parquet-format (BloomFilter.md): each key maps to ONE 32-byte (8-word)
  * bucket selected by the top 32 hash bits via multiply-shift range
  * reduction, and sets one bit in each of the 8 words, chosen by the low 32
  * hash bits multiplied by 8 fixed odd salts. One cache line per probe.
  * Long keys are mixed with the splitmix64 finalizer (public domain, Vigna);
  * STRING keys enter as the xxhash64 of the unescaped UTF-8 value bytes
  * (writer and probe hash identically) and are mixed the same way.
  *
  * Soundness: only NON-NULL values are inserted, so a negative probe proves
  * "no non-null row of this block equals K" — exactly the refutation an
  * equality or key-set predicate needs (null never equals anything). False
  * positives only KEEP blocks; kept blocks re-evaluate every row.
  */
object BlockBlooms {
  val BloomMagic: Int = 0x344d4342 // "4MCB"
  val BloomVersion: Int = 1
  // Version 2 = v1 plus, after the per-block entries, one FILE-level SBBF
  // per bloom column: `nBuckets(4)` (−1 = absent: the file's distinct key
  // count outgrew the fixed size; 0 = no non-null keys) then the buckets.
  // Fixed-size by design — per-block filters are sized to each block's
  // distinct count and cannot be unioned across blocks, so the file filter
  // is accumulated writer-side in parallel. Its consumer is the directory
  // manifest ([[McManifest]]): a point lookup / denylist probe refutes whole
  // FILES at the driver, the level above the per-block refutation inside a
  // file. v1 parsers ignore v2 segments entirely (blooms absent: less
  // pruning, never wrong); `option("bloomVersion", "1")` pins the old
  // segment for fleets with an older read floor.
  val BloomVersionFile: Int = 2
  val TrailerLen: Int = 12

  /** Default file-level filter size: 256 buckets = 8 KiB per column. With
    * the ≥[[FileBloomMinBitsPerKey]] density floor this covers files of up
    * to ~13k distinct keys per column (bucketed/clustered layouts, dimension
    * spills); beyond that the filter is marked absent rather than saturated
    * — a useless always-true filter would cost manifest bytes for no
    * refutation. `option("fileBloomBuckets", n)` resizes.
    */
  val DefaultFileBuckets: Int = 256
  val FileBloomMinBitsPerKey: Int = 5

  /** Writer defaults: ~10 bits/key ≈ 0.9% fpp; the bucket cap bounds the
    * per-block-column filter at 256 KiB (a block with more distinct keys
    * than the cap can size for gets a denser, weaker filter — sound, just
    * less selective).
    */
  val DefaultBitsPerKey: Int = 10
  val DefaultMaxBuckets: Int = 8192

  // parquet-format SBBF salts (public spec)
  private[format] val Salts: Array[Int] = Array(
    0x47b6137b, 0x44974d91, 0x8824ad5b, 0xa2b7289d,
    0x705495c7, 0x2df1424b, 0x9efc4947, 0x5c6bfb31)

  /** splitmix64 finalizer — avalanching mix of a long key. */
  def mix64(x0: Long): Long = {
    var z = x0 + 0x9e3779b97f4b7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Bucket index for a hash given `nBuckets` (multiply-shift reduction). */
  @inline private[format] def bucketOf(hash: Long, nBuckets: Int): Int =
    ((((hash >>> 32) & 0xffffffffL) * nBuckets) >>> 32).toInt

  /** Set the key's 8 bits in `words` (one per word of its bucket). */
  def insert(words: Array[Int], base: Int, nBuckets: Int, key: Long): Unit = {
    val h = mix64(key)
    val b = base + bucketOf(h, nBuckets) * 8
    val lo = h.toInt
    var i = 0
    while (i < 8) {
      words(b + i) |= 1 << ((lo * Salts(i)) >>> 27)
      i += 1
    }
  }

  /** Probe: false ⇒ key was definitely never inserted. */
  def contains(words: Array[Int], base: Int, nBuckets: Int, key: Long): Boolean = {
    val h = mix64(key)
    val b = base + bucketOf(h, nBuckets) * 8
    val lo = h.toInt
    var i = 0
    while (i < 8) {
      if ((words(b + i) & (1 << ((lo * Salts(i)) >>> 27))) == 0) return false
      i += 1
    }
    true
  }

  /** Buckets for `distinct` keys at `bitsPerKey`, capped. */
  private[format] def sizeBuckets(distinct: Int, bitsPerKey: Int, maxBuckets: Int): Int = {
    val want = (distinct.toLong * bitsPerKey + 255) / 256
    math.max(1, math.min(want, maxBuckets.toLong)).toInt
  }
}

/** Parsed bloom segment for one file. `colIdx` are DATA-schema column
  * ordinals; `nBuckets`/`offset` are indexed `[block * nCols + colOrd]`
  * (colOrd = position within `colIdx`, not the schema ordinal).
  */
final class McBlockBlooms(
    val colIdx: Array[Int],
    val nBuckets: Array[Int], // -1 absent, 0 empty, >0 bucket count
    val offset: Array[Int], // word offset into `words`
    val words: Array[Int],
    // v2 FILE-level filters, per colOrd (-1 absent / 0 empty); empty arrays
    // for v1 segments
    val fileNBuckets: Array[Int] = Array.empty,
    val fileOffset: Array[Int] = Array.empty,
    val fileWords: Array[Int] = Array.empty
) extends Serializable {
  def nCols: Int = colIdx.length
  def nBlocks: Int = if (colIdx.isEmpty) 0 else nBuckets.length / colIdx.length

  /** colOrd for a data-schema column, or -1 when the column has no blooms. */
  def ordOf(col: Int): Int = {
    var i = 0
    while (i < colIdx.length) { if (colIdx(i) == col) return i; i += 1 }
    -1
  }

  /** Three-valued per-block membership: 1 = maybe (or bloom absent),
    * 0 = definitely no non-null value equals `key`.
    */
  def mayContain(block: Int, colOrd: Int, key: Long): Boolean = {
    val k = block * colIdx.length + colOrd
    val nb = nBuckets(k)
    if (nb < 0) true // absent: undecidable
    else if (nb == 0) false // no non-null keys in this block
    else BlockBlooms.contains(words, offset(k), nb, key)
  }

  /** True when block `block` has a usable (present) filter for `colOrd`. */
  def present(block: Int, colOrd: Int): Boolean =
    nBuckets(block * colIdx.length + colOrd) >= 0

  /** File-level membership (v2): false ⇒ no non-null row of the whole FILE
    * equals `key`. Absent (v1 segment, or the file outgrew the fixed size)
    * ⇒ true.
    */
  def fileMayContain(colOrd: Int, key: Long): Boolean = {
    if (colOrd >= fileNBuckets.length) return true
    val nb = fileNBuckets(colOrd)
    if (nb < 0) true
    else if (nb == 0) false
    else BlockBlooms.contains(fileWords, fileOffset(colOrd), nb, key)
  }

  def filePresent(colOrd: Int): Boolean =
    colOrd < fileNBuckets.length && fileNBuckets(colOrd) >= 0

  /** Raw file-level filter for `colOrd` ((nBuckets, words) — words copied),
    * or None when absent. The manifest writer lifts these into v3 entries.
    */
  def fileBloomOf(colOrd: Int): Option[(Int, Array[Int])] = {
    if (colOrd >= fileNBuckets.length) return None
    val nb = fileNBuckets(colOrd)
    if (nb < 0) None
    else if (nb == 0) Some((0, Array.empty[Int]))
    else Some((nb, java.util.Arrays.copyOfRange(fileWords, fileOffset(colOrd),
      fileOffset(colOrd) + nb * 8)))
  }
}

object McBlockBlooms {
  import BlockBlooms._

  /** Parse a bloom segment (bytes from magic through trailing checksum).
    * Returns None for unknown versions; throws on corruption.
    */
  def parse(seg: Array[Byte]): Option[McBlockBlooms] = {
    var p = 0
    def r4(): Int = {
      val v = ((seg(p) & 0xff) << 24) | ((seg(p + 1) & 0xff) << 16) |
        ((seg(p + 2) & 0xff) << 8) | (seg(p + 3) & 0xff)
      p += 4; v
    }
    if (r4() != BloomMagic) throw new java.io.IOException("4mc bloom segment magic mismatch")
    val version = r4()
    if (version < BloomVersion || version > BloomVersionFile) return None
    val nCols = r4()
    if (nCols < 0 || nCols > 4096) throw new java.io.IOException(s"4mc bloom nCols $nCols out of range")
    val colIdx = new Array[Int](nCols)
    var i = 0
    while (i < nCols) { colIdx(i) = r4(); i += 1 }
    val nBlocks = r4()
    if (nBlocks < 0 || nBlocks > (1 << 24)) throw new java.io.IOException(s"4mc bloom nBlocks $nBlocks out of range")
    val n = nBlocks * nCols
    val nBuckets = new Array[Int](n)
    val offset = new Array[Int](n)
    // first pass over entries happens inline: sizes are consumed in order
    val wordsBuf = new java.io.ByteArrayOutputStream // raw big-endian words
    var totalWords = 0
    var k = 0
    while (k < n) {
      val nb = r4()
      if (nb < -1 || nb > (1 << 20)) throw new java.io.IOException(s"4mc bloom bucket count $nb out of range")
      nBuckets(k) = nb
      offset(k) = totalWords
      if (nb > 0) {
        val bytes = nb * 32
        wordsBuf.write(seg, p, bytes)
        p += bytes
        totalWords += nb * 8
      }
      k += 1
    }
    val raw = wordsBuf.toByteArray
    val words = new Array[Int](totalWords)
    var w = 0
    while (w < totalWords) {
      val q = w * 4
      words(w) = ((raw(q) & 0xff) << 24) | ((raw(q + 1) & 0xff) << 16) |
        ((raw(q + 2) & 0xff) << 8) | (raw(q + 3) & 0xff)
      w += 1
    }
    if (version < BloomVersionFile)
      return Some(new McBlockBlooms(colIdx, nBuckets, offset, words))
    // v2: FILE-level filters, one per column
    val fNb = new Array[Int](nCols)
    val fOff = new Array[Int](nCols)
    val fBuf = new java.io.ByteArrayOutputStream
    var fWords = 0
    var c = 0
    while (c < nCols) {
      val nb = r4()
      if (nb < -1 || nb > (1 << 20)) throw new java.io.IOException(s"4mc file-bloom bucket count $nb out of range")
      fNb(c) = nb
      fOff(c) = fWords
      if (nb > 0) {
        fBuf.write(seg, p, nb * 32)
        p += nb * 32
        fWords += nb * 8
      }
      c += 1
    }
    val fRaw = fBuf.toByteArray
    val fw = new Array[Int](fWords)
    w = 0
    while (w < fWords) {
      val q = w * 4
      fw(w) = ((fRaw(q) & 0xff) << 24) | ((fRaw(q + 1) & 0xff) << 16) |
        ((fRaw(q + 2) & 0xff) << 8) | (fRaw(q + 3) & 0xff)
      w += 1
    }
    Some(new McBlockBlooms(colIdx, nBuckets, offset, words, fNb, fOff, fw))
  }
}

/** Writer-side accumulator, mirroring [[McStatsBuilder]]'s protocol: the csv
  * OutputWriter calls [[startLine]] once per row with the pending block
  * coordinates (same ownership rule — a line starting at offset 0 of block b
  * belongs to b−1) and [[observe]] per bloom column with each NON-NULL
  * long-domain value. Key buffers hold raw (duplicated) keys per open block
  * and are folded into a sized SBBF as soon as the writer moves two blocks
  * past — memory stays O(lines per block), not O(file).
  */
final class McBloomBuilder(
    val cols: Array[Int], // data-schema ordinals, ascending
    bitsPerKey: Int = BlockBlooms.DefaultBitsPerKey,
    maxBuckets: Int = BlockBlooms.DefaultMaxBuckets,
    maxKeysBuffered: Int = 1 << 22,
    fileBuckets: Int = BlockBlooms.DefaultFileBuckets) { // 0 = v1 segment, no file filters
  import BlockBlooms._

  private val nCols = cols.length

  // v2 FILE-level filters: fixed-size, accumulated in parallel with the
  // per-block buffers (per-block filters are sized per block and cannot be
  // unioned after the fact). The probe-before-insert keeps an approximate
  // distinct count; past the density floor the filter is ABANDONED — a
  // saturated always-true filter would spend manifest bytes refuting nothing.
  private val fileWords: Array[Array[Int]] = new Array[Array[Int]](nCols)
  private val fileDistinct = new Array[Int](nCols)
  private val fileDead = new Array[Boolean](nCols)
  private val fileMaxDistinct =
    if (fileBuckets > 0) fileBuckets * 256 / FileBloomMinBitsPerKey else 0

  private final class BlockKeys {
    // per colOrd: growable key buffer; null after fold or once over cap
    val keys = new Array[Array[Long]](nCols)
    val len = new Array[Int](nCols)
    val overCap = new Array[Boolean](nCols)
    var folded: Array[(Int, Array[Int])] = null // (nBuckets, words) per colOrd
  }

  private val blocks = scala.collection.mutable.ArrayBuffer.empty[BlockKeys]
  private var cur: BlockKeys = _
  private var curIdx: Int = -1

  private def blockAt(i: Int): BlockKeys = {
    while (blocks.length <= i) blocks += new BlockKeys
    blocks(i)
  }

  /** Fold one block's key buffers into sized filters and free the buffers. */
  private def fold(bk: BlockKeys): Unit = {
    if (bk.folded != null) return
    bk.folded = Array.tabulate(nCols) { c =>
      if (bk.overCap(c)) (-1, null)
      else {
        val n = bk.len(c)
        if (n == 0) (0, null)
        else {
          val a = bk.keys(c)
          java.util.Arrays.sort(a, 0, n)
          var distinct = 1
          var i = 1
          while (i < n) { if (a(i) != a(i - 1)) distinct += 1; i += 1 }
          val nb = sizeBuckets(distinct, bitsPerKey, maxBuckets)
          val words = new Array[Int](nb * 8)
          i = 0
          while (i < n) {
            if (i == 0 || a(i) != a(i - 1)) insert(words, 0, nb, a(i))
            i += 1
          }
          (nb, words)
        }
      }
    }
    java.util.Arrays.fill(bk.keys.asInstanceOf[Array[AnyRef]], null)
  }

  /** Columnar-layout registration: owner is always the block itself (rows
    * never span blocks) — see [[McStatsBuilder.startLineOwned]].
    */
  def startLineOwned(blockIdx: Int): Unit = startLineAt(blockIdx)

  def startLine(blockIdx: Int, offsetInBlock: Int): Unit =
    startLineAt(if (offsetInBlock == 0 && blockIdx > 0) blockIdx - 1 else blockIdx)

  private def startLineAt(owner: Int): Unit = {
    if (owner != curIdx) {
      cur = blockAt(owner)
      curIdx = owner
      // blocks more than one behind the owner can no longer gain lines
      var b = 0
      while (b < owner - 1) { fold(blocks(b)); b += 1 }
    }
  }

  /** Record a non-null value of bloom column ordinal `colOrd` (position in
    * [[cols]], not the schema ordinal) for the current line's block.
    */
  def observe(colOrd: Int, v: Long): Unit = {
    if (fileBuckets > 0 && !fileDead(colOrd)) {
      var fwd = fileWords(colOrd)
      if (fwd == null) { fwd = new Array[Int](fileBuckets * 8); fileWords(colOrd) = fwd }
      if (!contains(fwd, 0, fileBuckets, v)) {
        if (fileDistinct(colOrd) >= fileMaxDistinct) {
          fileDead(colOrd) = true; fileWords(colOrd) = null
        } else {
          insert(fwd, 0, fileBuckets, v)
          fileDistinct(colOrd) += 1
        }
      }
    }
    if (cur.overCap(colOrd)) return
    var a = cur.keys(colOrd)
    val n = cur.len(colOrd)
    if (a == null || n == a.length) {
      if (n >= maxKeysBuffered) { cur.overCap(colOrd) = true; cur.keys(colOrd) = null; return }
      val grown = new Array[Long](if (a == null) 1024 else math.min(a.length * 2, maxKeysBuffered))
      if (a != null) System.arraycopy(a, 0, grown, 0, n)
      a = grown
      cur.keys(colOrd) = a
    }
    a(n) = v
    cur.len(colOrd) = n + 1
  }

  /** Serialize filters for exactly `nBlocks` container blocks. */
  def serialize(nBlocks: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(64 + nBlocks * nCols * 8)
    def w4(v: Int): Unit = {
      bos.write((v >>> 24) & 0xff); bos.write((v >>> 16) & 0xff)
      bos.write((v >>> 8) & 0xff); bos.write(v & 0xff)
    }
    w4(BloomMagic)
    w4(if (fileBuckets > 0) BloomVersionFile else BloomVersion)
    w4(nCols)
    cols.foreach(w4)
    w4(nBlocks)
    var b = 0
    while (b < nBlocks) {
      if (b < blocks.length) {
        val bk = blocks(b)
        fold(bk)
        var c = 0
        while (c < nCols) {
          val (nb, words) = bk.folded(c)
          w4(nb)
          if (nb > 0) {
            var w = 0
            while (w < words.length) { w4(words(w)); w += 1 }
          }
          c += 1
        }
      } else {
        var c = 0
        while (c < nCols) { w4(0); c += 1 } // block owns no lines: empty filter
      }
      b += 1
    }
    if (fileBuckets > 0) {
      var c = 0
      while (c < nCols) {
        if (fileDead(c)) w4(-1)
        else if (fileWords(c) == null) w4(0) // no non-null keys in the file
        else {
          w4(fileBuckets)
          val fwd = fileWords(c)
          var w = 0
          while (w < fwd.length) { w4(fwd(w)); w += 1 }
        }
        c += 1
      }
    }
    val totalLen = bos.size() + BlockBlooms.TrailerLen
    w4(totalLen)
    w4(BloomMagic)
    val body = bos.toByteArray
    val out = java.util.Arrays.copyOf(body, body.length + 4)
    val h = FourMc.xxhash32(body, 0, body.length)
    out(body.length) = ((h >>> 24) & 0xff).toByte
    out(body.length + 1) = ((h >>> 16) & 0xff).toByte
    out(body.length + 2) = ((h >>> 8) & 0xff).toByte
    out(body.length + 3) = (h & 0xff).toByte
    out
  }
}
