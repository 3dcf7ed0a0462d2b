package graft.sources

/** Serialization of a runtime join-key set into a 4mc scan option.
  *
  * `option(RuntimeKeyFilter.OptionKey, RuntimeKeyFilter.encode(col, keys))`
  * asserts that downstream keeps only rows whose `col` equals one of `keys`
  * (an inner/semi equi-join against the dim side that produced them). The
  * reader probes each block's zone map against the sorted set
  * ([[graft.format.McStatsPruning.keepBlocksForKeys]]) and skips refuted
  * blocks before any I/O beyond the footer — the fact-table analog of
  * dynamic partition pruning, at 4mc-block granularity.
  *
  * Wire format: `<col>:<base64(varint count ++ delta-varints of sorted
  * distinct keys)>`. Delta-varint keeps dense key sets at ~1 byte/key, so
  * even a 64k-key dim fits in a ~64 KiB option string. Caller-side cap:
  * [[encode]] refuses sets larger than `maxKeys` (default 1 << 20) — a dim
  * side bigger than that is not a broadcast-small dim, and the caller
  * should fall back to an unpruned scan + shuffle join.
  */
object RuntimeKeyFilter {

  val OptionKey = "runtimeKeyFilter"

  private def writeVarint(out: java.io.ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0L) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }

  private def encodeBody(keys: Array[Long], maxKeys: Int): String = {
    val sorted = keys.distinct.sorted
    require(sorted.length <= maxKeys,
      s"runtime key set has ${sorted.length} keys (> $maxKeys): this dim side is not " +
        "broadcast-small; scan unpruned and shuffle-join instead")
    val out = new java.io.ByteArrayOutputStream(sorted.length + 16)
    writeVarint(out, sorted.length.toLong)
    var prev = 0L
    var i = 0
    while (i < sorted.length) {
      val v = sorted(i)
      if (i == 0) {
        // zigzag the first absolute value so negative keys survive
        writeVarint(out, (v << 1) ^ (v >> 63))
      } else {
        writeVarint(out, v - prev)
      }
      prev = v
      i += 1
    }
    java.util.Base64.getEncoder.encodeToString(out.toByteArray)
  }

  /** Encode `keys` (any order, duplicates fine; all must be >= 0 after
    * sorting — negative keys use zigzag on the FIRST value only, deltas of a
    * sorted array are non-negative).
    */
  def encode(col: String, keys: Array[Long], maxKeys: Int = 1 << 20): String = {
    require(!col.contains(':'), s"column name may not contain ':': $col")
    col + ":" + encodeBody(keys, maxKeys)
  }

  /** Encode a HASHED-domain key set for a STRING column: values are the
    * xxhash64 of each key's UTF-8 bytes (what the bloom segment's writer
    * inserted — [[graft.format.BlockBlooms]]). Hashes carry no order
    * information about the underlying strings, so the reader prunes by
    * membership ([[graft.format.McStatsPruning.keepBlocksForHashedKeys]]):
    * blocks with a COMPLETE value dictionary refute exactly (r16, no bloom
    * needed), dict-less blocks probe the per-block bloom; files with
    * neither scan unpruned.
    * Marked with a `#` after the column separator ('#' is not a base64
    * character, so old and new specs are unambiguous).
    */
  def encodeHashed(col: String, hashes: Array[Long], maxKeys: Int = 1 << 20): String = {
    require(!col.contains(':'), s"column name may not contain ':': $col")
    col + ":#" + encodeBody(hashes, maxKeys)
  }

  /** Is this spec a hashed-string-domain filter ([[encodeHashed]])? */
  def isHashed(spec: String): Boolean = {
    val sep = spec.indexOf(':')
    sep > 0 && sep + 1 < spec.length && spec.charAt(sep + 1) == '#'
  }

  /** Decode to (column, sorted distinct keys-or-hashes). */
  def decode(spec: String): (String, Array[Long]) = {
    val sep = spec.indexOf(':')
    require(sep > 0, s"malformed runtime key filter spec: $spec")
    val col = spec.substring(0, sep)
    val body = if (isHashed(spec)) spec.substring(sep + 2) else spec.substring(sep + 1)
    val bytes = java.util.Base64.getDecoder.decode(body)
    var p = 0
    def readVarint(): Long = {
      var v = 0L
      var shift = 0
      var b = 0
      do {
        b = bytes(p) & 0xff; p += 1
        v |= (b & 0x7fL) << shift
        shift += 7
      } while ((b & 0x80) != 0)
      v
    }
    val n = readVarint().toInt
    val keys = new Array[Long](n)
    var prev = 0L
    var i = 0
    while (i < n) {
      if (i == 0) {
        val z = readVarint()
        prev = (z >>> 1) ^ -(z & 1L)
      } else prev += readVarint()
      keys(i) = prev
      i += 1
    }
    (col, keys)
  }
}
