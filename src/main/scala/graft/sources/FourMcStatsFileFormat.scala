package graft.sources

import graft.format._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.mapreduce.Job
import org.apache.spark.TaskContext
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.execution.datasources.{FileFormat, OutputWriterFactory, PartitionedFile}
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** Internal scan relation for MIN/MAX/COUNT(*) aggregate pushdown over 4mc
  * files — the zone-map twin of parquet's aggregate pushdown
  * (reference zone maps: the stats segment, `graft/format/BlockStats.scala`).
  *
  * [[graft.plans.McAggregatePushdown]] rewrites an unfiltered global
  * `Aggregate[min(a), max(b), count(*)]` over a 4mc csv scan into the same
  * aggregate over THIS format, whose schema is one row per owned block:
  * `_min_<i>` / `_max_<i>` (type of data column i) and `_cnt` (long). For a
  * block whose footer stats can answer every requested bound exactly, the
  * row is synthesized from the stats segment — the block is NEVER read or
  * decompressed. Blocks that can't (NaN-poisoned double bounds, truncated
  * string bounds, custom timestamp formats, stats-less files) are decoded
  * and emit one `(v, v, …, 1)` row per owned line — `min(min)`/`max(max)`/
  * `sum(cnt)` over the union is exact either way, so degradation is
  * per-block and value-transparent.
  *
  * Split semantics are identical to the data scan: a block's stats row is
  * emitted by the split that owns the block header, so any partition of the
  * byte range partitions the aggregate inputs exactly (same ownership rule
  * as [[FourMcFileFormat.ownedLineCount]]). Footer reads stay task-side —
  * planning this relation lists files only.
  *
  * `preds` (data-column range predicates compiled by the rule) extend the
  * pushdown to FILTERED aggregates (`MIN(ts) WHERE ts >= X`): each owned
  * block is classified against its zone map as all-rows-pass (stats row as
  * usual — every row contributes), no-row-passes (skipped entirely, counted
  * in `blocksSkipped`), or straddling (decoded, predicates re-evaluated per
  * line). Null filter values fail every comparison, so a block proves
  * "all pass" only with a zero null count on the filter column, while
  * "none pass" needs only the non-null bounds (nulls fail anyway).
  */
class FourMcStatsFileFormat(
    origSchema: StructType,
    preds: Seq[FourMcStatsFileFormat.StatsPred] = Nil,
    groupColsIn: Seq[Int] = Nil
) extends FileFormat with Serializable {

  // dict-group mode: one string data column answered from v4 per-column
  // histograms, or TWO answered from v5 JOINT histograms (ascending ordinal
  // order fixes the relation row layout; the rule resolves by name/exprId,
  // so the user's GROUP BY order is free)
  private val grpCols: Array[Int] = groupColsIn.sorted.toArray
  require(grpCols.length <= 2, "dict-group mode supports at most two group columns")

  override def toString: String = "4MC-STATS"

  override def inferSchema(
      sparkSession: SparkSession,
      options: Map[String, String],
      files: Seq[org.apache.hadoop.fs.FileStatus]
  ): Option[StructType] = None // constructed by the rule with an explicit schema

  override def prepareWrite(
      sparkSession: SparkSession,
      job: Job,
      options: Map[String, String],
      dataSchema: StructType
  ): OutputWriterFactory =
    throw new UnsupportedOperationException("4mc stats relation is read-only")

  override def isSplitable(
      sparkSession: SparkSession,
      options: Map[String, String],
      path: org.apache.hadoop.fs.Path
  ): Boolean = true

  override def buildReader(
      sparkSession: SparkSession,
      dataSchema: StructType,
      partitionSchema: StructType,
      requiredSchema: StructType,
      filters: Seq[Filter],
      options: Map[String, String],
      hadoopConf: Configuration
  ): PartitionedFile => Iterator[InternalRow] = {
    val broadcastConf =
      sparkSession.sparkContext.broadcast(new SerializableConfiguration(hadoopConf))
    val delim = CsvPayload.delimiterOf(options.getOrElse("delimiter", "|"))
    val tsFmt = options.getOrElse("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSS")
    val acceptAny = options.get("acceptAnyExtension").exists(_.toBoolean)
    val totalFields = origSchema.length
    val origTags: Array[Int] = origSchema.fields.map(f => CsvPayload.tagOf(f.dataType))
    val origScale: Array[Int] = origSchema.fields.map(f => CsvPayload.scaleOf(f.dataType))
    val origPrec: Array[Int] = origSchema.fields.map(f => CsvPayload.precisionOf(f.dataType))
    val tsMicroDigits = CsvPayload.fixedPatternFracDigits(tsFmt)

    // decode the synthetic field names: _min_<i>/_max_<i>/_nn_<i>/_sum_<i>/_cnt,
    // plus (dict-group mode) the GROUP column(s) themselves under their
    // original names
    final case class FieldSpec(kind: Int, col: Int) // 0=min 1=max 2=cnt 3=non-null cnt 4=sum 5=group value
    val groupNames: Map[String, Int] =
      grpCols.map(c => origSchema.fields(c).name -> c).toMap
    val specs: Array[FieldSpec] = requiredSchema.fields.map { f =>
      f.name match {
        case n if groupNames.contains(n)      => FieldSpec(5, groupNames(n))
        case "_cnt"                           => FieldSpec(2, -1)
        case n if n.startsWith("_min_")       => FieldSpec(0, n.stripPrefix("_min_").toInt)
        case n if n.startsWith("_max_")       => FieldSpec(1, n.stripPrefix("_max_").toInt)
        case n if n.startsWith("_nn_")        => FieldSpec(3, n.stripPrefix("_nn_").toInt)
        case n if n.startsWith("_sum_")       => FieldSpec(4, n.stripPrefix("_sum_").toInt)
        case other =>
          throw new IllegalArgumentException(s"unexpected stats-relation field $other")
      }
    }
    val groupMode = grpCols.nonEmpty
    val jointMode = grpCols.length == 2
    val needMin: Set[Int] = specs.filter(_.kind == 0).map(_.col).toSet
    val needMax: Set[Int] = specs.filter(_.kind == 1).map(_.col).toSet
    val needNn: Set[Int] = specs.filter(_.kind == 3).map(_.col).toSet
    val needSum: Set[Int] = specs.filter(_.kind == 4).map(_.col).toSet
    // bounds columns gate stats usability (exactness of min/max); sum
    // columns gate on the v2 FlagHasSum (v1 segments decode instead);
    // nn-only columns need just the nullCount array, which is always exact
    // when a stats segment exists. Predicate columns are parsed in the
    // decode fallback (their values feed the per-line filter) but impose no
    // exactness condition — classification already consulted their zones.
    val boundsCols: Set[Int] = needMin ++ needMax
    val predCols: Set[Int] = preds.map(_.col).toSet
    val groupCols: Set[Int] = grpCols.toSet
    val neededCols: Array[Int] =
      (boundsCols ++ needNn ++ needSum ++ predCols ++ groupCols).toArray.sorted
    val isBoundsCol: Array[Boolean] = neededCols.map(boundsCols.contains)
    val isSumCol: Array[Boolean] = neededCols.map(needSum.contains)
    val needsValue: Array[Boolean] = neededCols.map(c =>
      boundsCols.contains(c) || needSum.contains(c) || predCols.contains(c) ||
        groupCols.contains(c))
    val neededFields = if (neededCols.isEmpty) 0 else neededCols.max + 1
    val predArr: Array[FourMcStatsFileFormat.StatsPred] = preds.toArray

    (file: PartitionedFile) => {
      val p = file.toPath.getName
      if (!acceptAny && !p.endsWith(".4mc") && !p.endsWith(".4mz")) Iterator.empty
      else {
        val conf = broadcastConf.value.value
        val in = FourMcFileFormat.openInput(file, conf)
        Option(TaskContext.get()).foreach(_.addTaskCompletionListener[Unit](_ => in.close()))
        val index = FourMcFileFormat.cachedIndex(file, in)
        val alignedStart = index.nextBlockAt(math.max(file.start, FourMc.HeaderLen.toLong))
        val splitEnd = file.start + file.length
        val alignedEnd =
          if (splitEnd >= index.eosPos) index.eosPos else index.nextBlockAt(splitEnd)
        val ordStart = index.ordAt(alignedStart)
        val ordEnd = index.ordAt(alignedEnd) // exclusive
        // per-FILE effective tags: micros-encoded timestamps carry tag 14
        // in this file's stats segment (identity mapping — origTags indexes
        // data-schema ordinals directly)
        val effTags = CsvPayload.fileTags(
          origTags, Array.tabulate(origTags.length)(identity), index.stats)

        /** Can block `b`'s stats answer every requested bound EXACTLY?
          * (nn-only columns impose no condition: nullCount is stored
          * exactly for every column whenever the stats segment exists.)
          */
        def statsUsable(st: McBlockStats, b: Int): Boolean = {
          if (jointMode) {
            // two-column dict-group mode: the block must carry a v5 JOINT
            // histogram for the pair — exact and complete by construction
            // (Σ entry counts == owned lines, nulls included); blocks
            // without one (v≤4 files, entry-cap overflow, dict death)
            // decode instead
            if (st.lineCount(b) > 0 && st.jointAt(b, grpCols(0), grpCols(1)) == null)
              return false
          } else if (groupMode) {
            // dict-group mode: the block's exact value histogram (v4 dict
            // counts) must cover the group column — or the block has no
            // non-null group values at all (only the null-group row, whose
            // count is the always-exact nullCount)
            val k = b * st.nCols + grpCols(0)
            if (st.lineCount(b) - st.nullCount(k) > 0 && st.dictCountsAt(k) == null)
              return false
          }
          var ci = 0
          while (ci < neededCols.length) {
            val c = neededCols(ci)
            val k = b * st.nCols + c
            val nonNull = st.lineCount(b) - st.nullCount(k)
            if (isBoundsCol(ci) && nonNull > 0) {
              if (!st.hasBounds(k)) return false // NaN-poisoned / custom-ts
              if (effTags(c) == CsvPayload.TagString) {
                // truncated (inexact) bounds are still answerable EXACTLY
                // when the block carries a complete value dictionary
                // (r16): min/max over its ≤32 exact entries
                val dictless = st.dictAt(k) == null
                if (needMin.contains(c) && !st.minExact(k) && dictless) return false
                if (needMax.contains(c) && !st.maxExact(k) && dictless) return false
              }
            }
            // v1 segments carry no sums: decode those blocks instead
            if (isSumCol(ci) && nonNull > 0 && !st.sumAt(k)) return false
            ci += 1
          }
          true
        }

        def statBound(st: McBlockStats, b: Int, c: Int, isMax: Boolean): Any = {
          val k = b * st.nCols + c
          if (st.lineCount(b) - st.nullCount(k) == 0 || !st.hasBounds(k)) null
          else (effTags(c): @scala.annotation.switch) match {
            case CsvPayload.TagString =>
              val exact = if (isMax) st.maxExact(k) else st.minExact(k)
              if (!exact) {
                // statsUsable admitted this block because a complete dict
                // exists: the true bound is the extreme ENTRY (entries are
                // exact and cover every non-null value the block owns)
                val dict = st.dictAt(k)
                var best: Array[Byte] = null
                var i = 0
                while (i < dict.length) {
                  val v = dict(i)
                  if (best == null ||
                      (if (isMax) McStatsPruning.byteCompare(v, best) > 0
                       else McStatsPruning.byteCompare(v, best) < 0)) best = v
                  i += 1
                }
                UTF8String.fromBytes(best)
              } else UTF8String.fromBytes(if (isMax) st.maxBytes(k) else st.minBytes(k))
            case CsvPayload.TagLong | CsvPayload.TagTimestamp |
                CsvPayload.TagTimestampMicros =>
              if (isMax) st.maxLong(k) else st.minLong(k)
            case CsvPayload.TagInt =>
              (if (isMax) st.maxLong(k) else st.minLong(k)).toInt
            case CsvPayload.TagDouble =>
              java.lang.Double.longBitsToDouble(if (isMax) st.maxLong(k) else st.minLong(k))
            case CsvPayload.TagFloat =>
              java.lang.Double.longBitsToDouble(if (isMax) st.maxLong(k) else st.minLong(k)).toFloat
            case CsvPayload.TagBoolean =>
              (if (isMax) st.maxLong(k) else st.minLong(k)) != 0L
            case CsvPayload.TagDate =>
              (if (isMax) st.maxLong(k) else st.minLong(k)).toInt
            case CsvPayload.TagDecimal =>
              org.apache.spark.sql.types.Decimal(
                if (isMax) st.maxLong(k) else st.minLong(k), origPrec(c), origScale(c))
          }
        }

        /** Stored per-block sum in Sum's result domain; null for all-null
          * blocks (SUM ignores nulls — a no-value block contributes nothing).
          */
        def statSum(st: McBlockStats, b: Int, c: Int): Any = {
          val k = b * st.nCols + c
          if (st.lineCount(b) - st.nullCount(k) == 0) null
          else if (effTags(c) == CsvPayload.TagDecimal)
            org.apache.spark.sql.types.Decimal(
              st.sumLong(k), math.min(38, origPrec(c) + 10), origScale(c))
          else if (graft.format.BlockStats.sumKindOf(effTags(c)) == 2)
            java.lang.Double.longBitsToDouble(st.sumLong(k))
          else st.sumLong(k)
        }

        /** Dict-group mode: one row per dictionary entry of block `b`'s
          * group column — `(value, count, count)` straight from the v4
          * histogram — plus a `(null, 0, nullCount)` row for the block's
          * null group. Exact: Σ counts + nullCount == lineCount by
          * construction (every non-null value passed through the builder's
          * dict, or the block wouldn't be stats-usable).
          */
        def groupRows(st: McBlockStats, b: Int): Iterator[InternalRow] = {
          val k = b * st.nCols + grpCols(0)
          val dict = st.dictAt(k)
          val counts = st.dictCountsAt(k)
          val nulls = st.nullCount(k)
          val nEnt = if (counts == null) 0 else dict.length
          val total = nEnt + (if (nulls > 0) 1 else 0)
          (0 until total).iterator.map { e =>
            val isNullRow = e >= nEnt
            val vals = new Array[Any](specs.length)
            var i = 0
            while (i < specs.length) {
              val s = specs(i)
              vals(i) = (s.kind: @scala.annotation.switch) match {
                case 2 => if (isNullRow) nulls.toLong else counts(e).toLong
                case 3 => if (isNullRow) 0L else counts(e).toLong
                case 5 => if (isNullRow) null else UTF8String.fromBytes(dict(e))
                case other =>
                  throw new IllegalStateException(s"spec kind $other in dict-group mode")
              }
              i += 1
            }
            new GenericInternalRow(vals)
          }
        }

        /** Two-column dict-group mode: one row per JOINT histogram entry of
          * block `b` — `(v1, v2, nn1, nn2, count)` straight from the v5
          * table. A −1 entry ordinal is the NULL value of that column; its
          * `_nn_<c>` contribution is 0 (COUNT(col) skips nulls) while `_cnt`
          * still carries the pair's row count.
          */
        def jointRows(st: McBlockStats, b: Int): Iterator[InternalRow] = {
          val jh = st.jointAt(b, grpCols(0), grpCols(1))
          if (jh == null) return Iterator.empty // statsUsable admits only empty blocks here
          val d1 = st.dictAt(b * st.nCols + grpCols(0))
          val d2 = st.dictAt(b * st.nCols + grpCols(1))
          (0 until jh.counts.length).iterator.map { e =>
            val vals = new Array[Any](specs.length)
            var i = 0
            while (i < specs.length) {
              val s = specs(i)
              vals(i) = (s.kind: @scala.annotation.switch) match {
                case 2 => jh.counts(e).toLong
                case 3 =>
                  val ord = if (s.col == grpCols(0)) jh.i1(e) else jh.i2(e)
                  if (ord < 0) 0L else jh.counts(e).toLong
                case 5 =>
                  if (s.col == grpCols(0)) {
                    if (jh.i1(e) < 0) null else UTF8String.fromBytes(d1(jh.i1(e)))
                  } else {
                    if (jh.i2(e) < 0) null else UTF8String.fromBytes(d2(jh.i2(e)))
                  }
                case other =>
                  throw new IllegalStateException(s"spec kind $other in dict-group mode")
              }
              i += 1
            }
            new GenericInternalRow(vals)
          }
        }

        def statsRow(st: McBlockStats, b: Int): InternalRow = {
          val vals = new Array[Any](specs.length)
          var i = 0
          while (i < specs.length) {
            val s = specs(i)
            vals(i) = (s.kind: @scala.annotation.switch) match {
              case 2 => st.lineCount(b).toLong
              case 3 => (st.lineCount(b) - st.nullCount(b * st.nCols + s.col)).toLong
              case 4 => statSum(st, b, s.col)
              case _ => statBound(st, b, s.col, isMax = s.kind == 1)
            }
            i += 1
          }
          new GenericInternalRow(vals)
        }

        lazy val fmt = java.time.format.DateTimeFormatter.ofPattern(tsFmt)
          .withZone(java.time.ZoneOffset.UTC)
        val starts = new Array[Int](totalFields + 1)

        val predPos: Array[Int] =
          predArr.map(p => java.util.Arrays.binarySearch(neededCols, p.col))

        /** Spark-total-order compare of a parsed filter value against the
          * predicate literal (NaN greatest, like Catalyst's double ordering).
          */
        def predCompare(p: FourMcStatsFileFormat.StatsPred, v: Any): Int =
          if (p.isDouble) {
            val d = v match {
              case d: java.lang.Double => d.doubleValue()
              case f: java.lang.Float  => f.doubleValue()
            }
            java.lang.Double.compare(d, p.litD)
          } else {
            val l = v match {
              case l: java.lang.Long    => l.longValue()
              case i: java.lang.Integer => i.longValue()
              case b: java.lang.Boolean => if (b) 1L else 0L
              case d: org.apache.spark.sql.types.Decimal => d.toUnscaledLong
            }
            java.lang.Long.compare(l, p.litL)
          }

        /** Re-evaluate the pushed predicates on one decoded line (straddling
          * or stats-less blocks). Null filter values fail every op.
          */
        def evalPreds(parsed: Array[Any], nonNull: Array[Boolean]): Boolean = {
          var i = 0
          while (i < predArr.length) {
            val pos = predPos(i)
            if (!nonNull(pos)) return false
            val p = predArr(i)
            if (p.op != FourMcStatsFileFormat.OpNotNull) {
              val c = predCompare(p, parsed(pos))
              val pass = (p.op: @scala.annotation.switch) match {
                case FourMcStatsFileFormat.OpGe => c >= 0
                case FourMcStatsFileFormat.OpGt => c > 0
                case FourMcStatsFileFormat.OpLe => c <= 0
                case FourMcStatsFileFormat.OpLt => c < 0
                case FourMcStatsFileFormat.OpEq => c == 0
              }
              if (!pass) return false
            }
            i += 1
          }
          true
        }

        /** Per-line fallback row: (v, v, …, 1) over the parsed needed cols,
          * or null when the line fails the pushed predicates. nn-only
          * columns skip the value parse — a null check is enough for a
          * non-null count.
          */
        def lineRow(bytes: Array[Byte]): InternalRow = {
          CsvPayload.scanBoundaries(bytes, delim, starts, 0, neededFields, totalFields)
          val parsed = new Array[Any](neededCols.length)
          val nonNull = new Array[Boolean](neededCols.length)
          var ci = 0
          while (ci < neededCols.length) {
            val c = neededCols(ci)
            val s = starts(c)
            val e = CsvPayload.fieldEnd(bytes, delim, starts, 0, c, s, neededFields, totalFields)
            val tag = effTags(c)
            // s > line length = the field is MISSING, not empty (an
            // older-generation file under positional schema evolution —
            // starts slots for absent trailing fields hold to+1): NULL for
            // every type, string included, matching the data readers
            val isNull = s > bytes.length ||
              CsvPayload.isNullMarker(bytes, s, e) || (s >= e && tag != CsvPayload.TagString)
            nonNull(ci) = !isNull
            parsed(ci) =
              if (isNull || !needsValue(ci))
                null
              else (tag: @scala.annotation.switch) match {
                case CsvPayload.TagString =>
                  if (s >= e) UTF8String.EMPTY_UTF8 else CsvPayload.unescape(bytes, s, e, delim)
                case CsvPayload.TagLong    => CsvPayload.parseLong(bytes, s, e)
                case CsvPayload.TagInt     => CsvPayload.parseInt(bytes, s, e)
                case CsvPayload.TagDouble  => CsvPayload.parseDouble(bytes, s, e)
                case CsvPayload.TagFloat   => CsvPayload.parseFloat(bytes, s, e)
                case CsvPayload.TagBoolean => bytes(s) == 't' || bytes(s) == 'T'
                case CsvPayload.TagDate    => CsvPayload.parseDateDays(bytes, s, e)
                case CsvPayload.TagDecimal =>
                  org.apache.spark.sql.types.Decimal(
                    CsvPayload.parseDecimalUnscaled(bytes, s, e, origScale(c)),
                    origPrec(c), origScale(c))
                case CsvPayload.TagTimestampMicros => CsvPayload.parseLong(bytes, s, e)
                case _ =>
                  if (tsMicroDigits >= 0 && CsvPayload.isFixedLayout(bytes, s, e))
                    CsvPayload.parseTimestampMicros(bytes, s, e)
                  else {
                    val inst = java.time.Instant.from(fmt.parse(CsvPayload.ascii(bytes, s, e)))
                    inst.getEpochSecond * 1000000L + inst.getNano / 1000L
                  }
              }
            ci += 1
          }
          if (predArr.nonEmpty && !evalPreds(parsed, nonNull)) return null
          val colPos: Int => Int = c => java.util.Arrays.binarySearch(neededCols, c)
          val vals = new Array[Any](specs.length)
          var i = 0
          while (i < specs.length) {
            val sp = specs(i)
            vals(i) = (sp.kind: @scala.annotation.switch) match {
              case 2 => 1L
              case 3 => if (nonNull(colPos(sp.col))) 1L else 0L
              case 4 => // per-line sum contribution, in Sum's result domain
                val pos = colPos(sp.col)
                if (!nonNull(pos)) null
                else parsed(pos) match {
                  case l: java.lang.Long    => l
                  case n: java.lang.Integer => java.lang.Long.valueOf(n.longValue)
                  case d: java.lang.Double  => d
                  case f: java.lang.Float   => java.lang.Double.valueOf(f.doubleValue)
                  case d: org.apache.spark.sql.types.Decimal =>
                    org.apache.spark.sql.types.Decimal(d.toUnscaledLong,
                      math.min(38, origPrec(sp.col) + 10), origScale(sp.col))
                }
              case _ => parsed(colPos(sp.col)) // kinds 0/1/5: the value itself
            }
            i += 1
          }
          new GenericInternalRow(vals)
        }

        /** Bloom ordinal per equality predicate (−1 when the file has no
          * bloom for that column): an OpEq conjunct whose key misses the
          * block's filter proves NO row passes — the block skips entirely,
          * even where the zone range (domain-spanning on unsorted keys)
          * cannot refute. `MIN/SUM/COUNT … WHERE key = K` becomes a bloom
          * sweep + one or two block decodes.
          */
        def predBloomOrds(blooms: Option[graft.format.McBlockBlooms]): Array[Int] =
          predArr.map { p =>
            if (p.op == FourMcStatsFileFormat.OpEq && !p.isDouble)
              blooms.map(_.ordOf(p.col)).getOrElse(-1)
            else -1
          }

        /** Classify block `b` against the pushed predicates' zone maps (and
          * blooms for equality conjuncts):
          * 0 = every row passes (stats row usable as-is), 1 = straddling
          * (decode + per-line eval), 2 = no row passes (skip the block).
          */
        def filterState(st: McBlockStats, b: Int, blooms: Option[graft.format.McBlockBlooms],
            bloomOrds: Array[Int]): Int = {
          var all = true
          var pi = 0
          while (pi < predArr.length) {
            val p = predArr(pi)
            val k = b * st.nCols + p.col
            val nonNull = st.lineCount(b) - st.nullCount(k)
            if (nonNull == 0) return 2 // only nulls (or empty): nothing passes
            if (bloomOrds(pi) >= 0 && !blooms.get.mayContain(b, bloomOrds(pi), p.litL))
              return 2 // no non-null value equals the key; nulls fail Eq too
            if (p.op == FourMcStatsFileFormat.OpNotNull) {
              if (st.nullCount(k) > 0) all = false
            } else if (!st.hasBounds(k)) {
              all = false // NaN-poisoned zone: undecidable, decode
            } else {
              val isDbl = p.isDouble
              // stored bits → comparable domain (doubles ride raw bits)
              val cLo =
                if (isDbl)
                  java.lang.Double.compare(
                    java.lang.Double.longBitsToDouble(st.minLong(k)), p.litD)
                else java.lang.Long.compare(st.minLong(k), p.litL)
              val cHi =
                if (isDbl)
                  java.lang.Double.compare(
                    java.lang.Double.longBitsToDouble(st.maxLong(k)), p.litD)
                else java.lang.Long.compare(st.maxLong(k), p.litL)
              val (allTrue, noneTrue) = (p.op: @scala.annotation.switch) match {
                case FourMcStatsFileFormat.OpGe => (cLo >= 0, cHi < 0)
                case FourMcStatsFileFormat.OpGt => (cLo > 0, cHi <= 0)
                case FourMcStatsFileFormat.OpLe => (cHi <= 0, cLo > 0)
                case FourMcStatsFileFormat.OpLt => (cHi < 0, cLo >= 0)
                case FourMcStatsFileFormat.OpEq =>
                  (cLo == 0 && cHi == 0, cLo > 0 || cHi < 0)
              }
              if (noneTrue) return 2 // non-null rows all fail; null rows fail too
              // "all rows pass" additionally needs zero nulls — null fails
              if (!allTrue || st.nullCount(k) > 0) all = false
            }
            pi += 1
          }
          if (all) 0 else 1
        }

        // Columnar files decode their fallback blocks through the cursor +
        // synthesized lines ([[graft.format.McColumnarLineSynth]]) — the
        // row-layout line iterators would feed multi-stream payloads to the
        // codec as one stream. lineRow parses synthesized lines unchanged.
        def columnarLines(keepArr: Array[Boolean]): Iterator[(Long, Array[Byte])] = {
          val fileCols = index.stats.get.tags.length
          val needed = neededCols.filter(_ < fileCols)
          val cur = new graft.format.McColumnarCursor(in, index, fileCols, needed,
            file.start, splitEnd, keepArr, permissive = false)
          Option(TaskContext.get()).foreach(_.addTaskCompletionListener[Unit] { _ =>
            FourMcScanMetrics.blocksRead.add(cur.blocksRead)
          })
          new graft.format.McColumnarLineSynth(
            cur, math.min(totalFields, fileCols), needed, delim)
        }

        index.stats match {
          // the segment must describe THIS read schema: a file written with
          // a different column set (text-payload compaction of a csv dir,
          // schema evolution, mixed-writer dirs) carries a stats segment
          // whose [block × col] arrays would MIS-INDEX under this schema's
          // ordinals — silently wrong bounds, not just a crash. Mismatched
          // files degrade to the per-line decode branch, value-exact.
          // (The data scan's pruning has the same guard in
          // McStatsPruning.keepBlocks; this is the aggregate twin.)
          // int→long type widening (r16) keeps the stats path: int-tagged
          // zone bounds, null counts, and sums already live in the long
          // domain, so they answer a LongType read column exactly.
          case Some(st) if st.nCols == totalFields && st.tags.indices.forall { i =>
              st.tags(i) == effTags(i) ||
                (st.tags(i) == CsvPayload.TagInt && effTags(i) == CsvPayload.TagLong)
            } =>
            // split blocks into stats-answered, decode-fallback, and (with
            // pushed predicates) refuted sets
            val keep = new Array[Boolean](index.numBlocks) // true = must decode
            var statsBlocks = 0
            var decodeBlocks = 0
            var skippedBlocks = 0
            val statsSet = new Array[Boolean](index.numBlocks)
            val bloomOrds = predBloomOrds(index.blooms)
            var b = ordStart
            while (b < ordEnd) {
              val fs = if (predArr.isEmpty) 0 else filterState(st, b, index.blooms, bloomOrds)
              if (fs == 2) skippedBlocks += 1
              else if (fs == 0 && statsUsable(st, b)) { statsSet(b) = true; statsBlocks += 1 }
              else { keep(b) = true; decodeBlocks += 1 }
              b += 1
            }
            FourMcScanMetrics.statsAggBlocks.add(statsBlocks)
            if (skippedBlocks > 0) FourMcScanMetrics.blocksSkipped.add(skippedBlocks)
            val synthesized: Iterator[InternalRow] =
              if (jointMode)
                (ordStart until ordEnd).iterator.filter(statsSet(_)).flatMap(jointRows(st, _))
              else if (groupMode)
                (ordStart until ordEnd).iterator.filter(statsSet(_)).flatMap(groupRows(st, _))
              else
                (ordStart until ordEnd).iterator.filter(statsSet(_)).map(statsRow(st, _))
            val decoded: Iterator[InternalRow] =
              if (decodeBlocks == 0) Iterator.empty
              else if (st.columnar)
                columnarLines(keep).map { case (_, bytes) => lineRow(bytes) }.filter(_ != null)
              else {
                val it = new FourMcPrunedLineIterator(in, index, file.start, splitEnd, keep)
                Option(TaskContext.get()).foreach(_.addTaskCompletionListener[Unit] { _ =>
                  FourMcScanMetrics.blocksRead.add(it.blocksRead)
                })
                it.map { case (_, bytes) => lineRow(bytes) }.filter(_ != null)
              }
            synthesized ++ decoded
          case _ if index.stats.exists(_.columnar) =>
            // schema-mismatched columnar file: decode every owned row via
            // the cursor (stats bounds can't be trusted under this schema,
            // but the synthesized lines parse value-exact)
            columnarLines(null).map { case (_, bytes) => lineRow(bytes) }.filter(_ != null)
          case _ =>
            // stats-less or schema-mismatched file: decode every owned line
            // (predicates, if any, evaluate per line)
            val it = new FourMcLineIterator(in, index, file.start, splitEnd, permissive = false)
            Option(TaskContext.get()).foreach(_.addTaskCompletionListener[Unit] { _ =>
              FourMcScanMetrics.blocksRead.add(ordEnd - ordStart)
            })
            it.map { case (_, bytes) => lineRow(bytes) }.filter(_ != null)
        }
      }
    }
  }
}

object FourMcStatsFileFormat {

  // StatsPred comparison ops
  final val OpGe = 0
  final val OpGt = 1
  final val OpLe = 2
  final val OpLt = 3
  final val OpEq = 4
  final val OpNotNull = 5

  /** One compiled data-column predicate: `col <op> literal` (or IS NOT
    * NULL). `isDouble` selects the comparison domain — double/float columns
    * compare via `litD` with Spark's total order (NaN greatest), everything
    * else (long/int/timestamp/boolean) via `litL`.
    */
  final case class StatsPred(col: Int, op: Int, isDouble: Boolean, litL: Long, litD: Double)

  /** Synthetic schema for the rule: bounds for each (colIdx, needMin,
    * needMax) target, a `_nn_<i>` per-block non-null count for each
    * COUNT(col) column, a `_sum_<i>` per-block sum for each SUM column
    * (long for int/long columns, double for double/float — Sum's own result
    * domain), plus the `_cnt` line-count column.
    */
  /** Schema for dict-group mode: the group column(s) under their ORIGINAL
    * names (so the rewritten Aggregate's grouping attributes resolve against
    * the relation unchanged), a per-(block, value) non-null count per group
    * column, and the per-(block, value) row count. One relation row per
    * dictionary entry per block (single column, + one per block's null
    * group) or per v5 JOINT-histogram entry (two columns); `GROUP BY g…`
    * aggregates become `Sum(_cnt)` / `Sum(_nn_g)` / `Min/Max(g)` /
    * `Count(DISTINCT g)` over these — all insensitive to the per-block row
    * multiplicity. Columns are laid out in ascending ordinal order, matching
    * the format's own normalization.
    */
  def groupSchema(origSchema: StructType, groupCols: Seq[Int]): StructType = {
    val cols = groupCols.sorted
    StructType(
      cols.map(c => StructField(origSchema.fields(c).name,
        origSchema.fields(c).dataType, nullable = true)) ++
        cols.map(c => StructField(s"_nn_$c", LongType, nullable = false)) :+
        StructField("_cnt", LongType, nullable = false))
  }

  def statsSchema(
      origSchema: StructType,
      targets: Seq[(Int, Boolean, Boolean)],
      nnCols: Seq[Int] = Nil,
      sumCols: Seq[Int] = Nil): StructType = {
    val fields = targets.flatMap { case (i, wantMin, wantMax) =>
      val dt = origSchema.fields(i).dataType
      (if (wantMin) Seq(StructField(s"_min_$i", dt, nullable = true)) else Nil) ++
        (if (wantMax) Seq(StructField(s"_max_$i", dt, nullable = true)) else Nil)
    } ++ nnCols.map(i => StructField(s"_nn_$i", LongType, nullable = false)) ++
      sumCols.map { i =>
        val dt = origSchema.fields(i).dataType
        val kind = graft.format.BlockStats.sumKindOf(CsvPayload.tagOf(dt))
        // decimal partials ride Sum's own result domain DecimalType(p+10, s):
        // a block's unscaled long sum always fits (values ≤ p digits, blocks
        // < 10^7 rows ⇒ sums < p+7 digits), so every stored sum converts
        // losslessly and re-summing partials is Sum's partial-then-combine
        val sumType = dt match {
          case d: org.apache.spark.sql.types.DecimalType =>
            org.apache.spark.sql.types.DecimalType(math.min(38, d.precision + 10), d.scale)
          case _ => if (kind == 2) DoubleType else LongType
        }
        StructField(s"_sum_$i", sumType, nullable = true)
      } :+ StructField("_cnt", LongType, nullable = false)
    StructType(fields)
  }
}
