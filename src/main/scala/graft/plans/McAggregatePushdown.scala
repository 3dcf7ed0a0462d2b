package graft.plans

import graft.sources.{FourMcFileFormat, FourMcStatsFileFormat, RuntimeKeyFilter}
import graft.sources.FourMcStatsFileFormat.StatsPred

import org.apache.spark.sql.catalyst.expressions.{
  Alias, And, AttributeReference, BinaryComparison, Coalesce, EqualTo, Expression, GreaterThan,
  GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual, Literal, NamedExpression
}
import org.apache.spark.sql.catalyst.expressions.aggregate.{
  AggregateExpression, Complete, Count, Max, Min, Sum
}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.LongType

/** MIN/MAX/SUM/COUNT aggregate pushdown from 4mc zone maps — the planner
  * rule that makes `SELECT min(ts), max(ts), sum(qty), count(*) FROM t`
  * a footer sweep instead of a full scan (parquet answers the same shapes
  * from row-group metadata via its aggregate pushdown; the 4mc analog is
  * the per-block stats segment, `graft/format/BlockStats.scala`).
  *
  * Matches an aggregate whose every output is `min(col)`, `max(col)`,
  * `sum(col)` (from v2 per-block sums: wrapping-long for integer columns —
  * bit-exact vs a plain LEGACY-mode scan — row-ordered double for
  * double/float; v1 segments decode per line instead),
  * `count(*)`, `count(col)` (non-null count, from the stats segment's exact
  * per-block null counts), or a grouping-column passthrough, over a 4mc csv
  * scan, with at least one non-`count(*)` aggregate (a bare COUNT(*)
  * already has the metadata-count fast path in the row/vectorized readers).
  * Grouping is allowed on bare PARTITION columns (each block belongs to
  * exactly one partition directory, so per-block stats rows group exactly);
  * a Filter below the aggregate is allowed when every conjunct either
  * touches only partition columns (partition pruning commutes with the
  * stats relation — both scan the same pruned file set) or compiles to a
  * zone-map range predicate on a non-string data column (`MIN(ts) WHERE
  * ts >= X`): those push into the stats relation, which emits the stats row
  * for blocks the zone map proves wholly inside the predicate, skips blocks
  * wholly outside, and decodes + re-filters only straddling blocks.
  * Rewrites the child to a
  * [[FourMcStatsFileFormat]] relation that emits one `(min…, max…, nn…,
  * cnt)` row per owned BLOCK from the footer stats — falling back to
  * per-line decode only for blocks whose stats cannot answer exactly
  * (NaN-poisoned doubles, truncated string bounds, stats-off files) — and
  * the aggregate to `min(min)`/`max(max)`/`coalesce(sum(nn|cnt), 0)`,
  * preserving the original output names and exprIds so the query's schema
  * is untouched.
  *
  * Refuses: data-column grouping, non-partition filters, distinct/
  * agg-filtered aggregates, min/max over partition columns, permissive
  * scans (corrupt-block skipping changes counts), scans with a runtime key
  * filter (its semi-join semantics don't commute with an aggregate),
  * non-csv payloads. Disable with `spark.graft.fourmc.aggPushdown=false`.
  */
object McAggregatePushdown extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg @ Aggregate(groups, aggExprs, child, _)
        if enabled && groups.forall(_.isInstanceOf[AttributeReference]) =>
      destructure(child)
        .flatMap { case (lr, filterCond) =>
          tryRewrite(groups.map(_.asInstanceOf[AttributeReference]), aggExprs, lr, filterCond)
        }
        .getOrElse(agg)
  }

  private def enabled: Boolean =
    org.apache.spark.sql.internal.SQLConf.get
      .getConfString("spark.graft.fourmc.aggPushdown", "true").toBoolean

  /** Gate for the zero-task COUNT(*) rewrite from manifest exact line
    * totals. IDENTITY ASSUMPTION (r16 advice): a manifest entry matches a
    * file by `(relative path, length, modification time)` — the same
    * convention Spark's own file index and every incremental system on HDFS
    * relies on. Every OTHER manifest consumer is self-correcting under a
    * stale match (pruning verdicts are re-checked by Spark's filters above
    * the scan), but THIS path turns a stale match into a wrong answer: a
    * data file rewritten in place to the identical byte length within the
    * filesystem's mtime granularity (typically 1 s local, 1 ms HDFS) would
    * be counted from the old entry. That requires an in-place overwrite —
    * not the tmp+rename pattern every committer here uses — plus a length
    * collision inside the granularity window. Deployments that rewrite
    * files in place should set this to false.
    */
  private def manifestCountEnabled: Boolean =
    org.apache.spark.sql.internal.SQLConf.get
      .getConfString("spark.graft.fourmc.manifestCount", "true").toBoolean

  /** Exact row total of the relation from its directory manifests, or None
    * unless EVERY listed data file is matched by identity — stale or
    * partial coverage (new files, stats-less files) refuses, keeping the
    * per-file metadata-count path. Matching is per ROOT: a file consults
    * only the manifest of the root it lives under, so identical
    * (rel, len, mtime) triples across roots can never cross-match.
    */
  private def manifestExactCount(fsRel: HadoopFsRelation): Option[Long] = {
    try {
      val roots = fsRel.location.rootPaths
      if (roots.isEmpty) return None
      val rootsWithManifests = roots.flatMap(r =>
        graft.sources.ManifestFileIndex.load(r, fsRel.sparkSession).map(r.toUri -> _))
      if (rootsWithManifests.isEmpty) return None
      var total = 0L
      fsRel.location.listFiles(Nil, Nil).foreach(_.files.foreach { f =>
        val name = f.getPath.getName
        if (name.endsWith(".4mc") || name.endsWith(".4mz")) {
          val uri = f.getPath.toUri
          val entry = rootsWithManifests.iterator.flatMap { case (ru, m) =>
            val r = ru.relativize(uri)
            if (!r.isAbsolute && r.getPath.nonEmpty)
              m.byKey.get((r.getPath, f.getLen, f.getModificationTime))
            else None
          }.nextOption().getOrElse(return None)
          total += entry.lineCountExact
        }
      })
      Some(total)
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  private def dictEnabled: Boolean =
    org.apache.spark.sql.internal.SQLConf.get
      .getConfString("spark.graft.fourmc.dictAggPushdown", "true").toBoolean

  /** One-footer driver probe: does the FIRST data file's stats segment carry
    * v4 dict histograms for `col` on at least half of its value-bearing
    * blocks?  O(1) per query (not per file), cached on the file's identity;
    * refusal keeps the vectorized scan — a high-cardinality column would
    * otherwise decode every block through the slower per-line fallback.
    */
  private val probeCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long, Long, String), java.lang.Boolean]

  private def probeDictCoverage(fsRel: HadoopFsRelation, cols: Seq[Int]): Boolean = {
    try {
      val acceptAny = fsRel.options.get("acceptAnyExtension").exists(_.toBoolean)
      val status = fsRel.location.listFiles(Nil, Nil).iterator
        .flatMap(_.files.iterator)
        .find { f =>
          val n = f.getPath.getName
          acceptAny || n.endsWith(".4mc") || n.endsWith(".4mz")
        }
        .getOrElse(return false)
      val key = (status.getPath.toString, status.getLen, status.getModificationTime,
        cols.mkString(","))
      val cached = probeCache.get(key)
      if (cached != null) return cached.booleanValue()
      if (probeCache.size > 4096) probeCache.clear()
      val conf = fsRel.sparkSession.sessionState.newHadoopConfWithOptions(fsRel.options)
      val path = status.getPath
      val fs = path.getFileSystem(conf) match {
        case cfs: org.apache.hadoop.fs.ChecksumFileSystem => cfs.getRawFileSystem
        case other                                        => other
      }
      val stream = fs.open(path)
      val ok =
        try {
          val len = status.getLen
          val in = new graft.format.McInput {
            def length: Long = len
            def readFully(pos: Long, buf: Array[Byte], off: Int, n: Int): Unit =
              stream.readFully(pos, buf, off, n)
            def close(): Unit = stream.close()
          }
          graft.sources.FourMcScanMetrics.footerReads.increment()
          val idx = graft.format.FourMcReader.readIndex(in)
          idx.stats match {
            case Some(st) if st.nCols == fsRel.dataSchema.length =>
              // single column: v4 per-column histograms on ≥ half the
              // value-bearing blocks; pair: v5 JOINT histograms on ≥ half
              // the line-bearing blocks (joints cover nulls too)
              var covered = 0
              var withVals = 0
              var b = 0
              while (b < st.nBlocks) {
                if (cols.length == 2) {
                  if (st.lineCount(b) > 0) {
                    withVals += 1
                    if (st.jointAt(b, cols(0), cols(1)) != null) covered += 1
                  }
                } else {
                  val k = b * st.nCols + cols(0)
                  if (st.lineCount(b) - st.nullCount(k) > 0) {
                    withVals += 1
                    if (st.dictCountsAt(k) != null) covered += 1
                  }
                }
                b += 1
              }
              withVals > 0 && covered * 2 >= withVals
            case _ => false
          }
        } finally stream.close()
      probeCache.put(key, java.lang.Boolean.valueOf(ok))
      ok
    } catch { case scala.util.control.NonFatal(_) => false }
  }

  /** Rewrite `Aggregate` over a dict-covered string column to the stats
    * relation's dict-group mode: count(*) → Sum(_cnt), count(g) →
    * Sum(_nn_g), min/max(g) → Min/Max(g), count(distinct g) stays a
    * distinct count — all multiplicity-insensitive over the per-(block,
    * entry) rows, so blocks answered from histograms and blocks decoded
    * per line compose exactly.
    */
  private def tryDictGroupRewrite(
      groups: Seq[AttributeReference],
      aggExprs: Seq[NamedExpression],
      lr: LogicalRelation,
      fsRel: HadoopFsRelation,
      dataSchema: org.apache.spark.sql.types.StructType,
      origPartAttrs: Seq[AttributeReference],
      partFilter: Option[Expression],
      dictCols: Seq[Int],
      dataPreds: Seq[StatsPred] = Nil,
      dataConj: Seq[Expression] = Nil): Option[LogicalPlan] = {
    val groupSet = org.apache.spark.sql.catalyst.expressions.AttributeSet(groups)
    val cols = dictCols.sorted // relation layout order (groupSchema normalizes too)
    val gOrigs: Seq[AttributeReference] = cols.map { c =>
      val gName = dataSchema.fields(c).name
      lr.output.collectFirst {
        case a: AttributeReference if a.name == gName => a
      }.getOrElse(return None)
    }

    sealed trait GReq
    case object GCnt extends GReq               // count(*) / count(non-null literal)
    case class GNn(g: Int) extends GReq         // count(g) — g indexes `cols`
    case class GMin(g: Int) extends GReq
    case class GMax(g: Int) extends GReq
    case class GDistinct(g: Int) extends GReq   // count(distinct g)
    sealed trait Out
    case class Pass(ne: NamedExpression) extends Out
    case class Agg(al: Alias, req: GReq) extends Out
    def gOf(c: Expression): Int = c match {
      case a: AttributeReference => gOrigs.indexWhere(_.exprId == a.exprId)
      case _                     => -1
    }
    val outs: Seq[Out] = aggExprs.map {
      case a: AttributeReference if groupSet.contains(a) => Pass(a)
      case al @ Alias(a: AttributeReference, _) if groupSet.contains(a) => Pass(al)
      case al @ Alias(ae: AggregateExpression, _) if ae.filter.isEmpty =>
        ae.aggregateFunction match {
          case Count(Seq(c)) if ae.isDistinct && gOf(c) >= 0 => Agg(al, GDistinct(gOf(c)))
          case _ if ae.isDistinct                       => return None
          case Count(Seq(Literal(v, _))) if v != null   => Agg(al, GCnt)
          case Count(Seq(c)) if gOf(c) >= 0             => Agg(al, GNn(gOf(c)))
          case Min(c) if gOf(c) >= 0                    => Agg(al, GMin(gOf(c)))
          case Max(c) if gOf(c) >= 0                    => Agg(al, GMax(gOf(c)))
          case _                                        => return None
        }
      case _ => return None
    }
    val reqs = outs.collect { case a: Agg => a }
    if (reqs.isEmpty) return None

    val schema = FourMcStatsFileFormat.groupSchema(dataSchema, cols)
    // compose with directory-manifest FILE pruning, like the non-group path:
    // the compiled data conjuncts travel statically since the stats relation
    // evaluates them inside the format
    val manifestLoc = {
      val underlying = fsRel.location match {
        case m: graft.sources.ManifestFileIndex => m.underlying
        case other                              => other
      }
      val pruningOn = org.apache.spark.sql.internal.SQLConf.get
        .getConfString("spark.graft.fourmc.manifestPruning", "true").toBoolean
      if (!pruningOn || dataConj.isEmpty) underlying
      else {
        val extra = dataConj.flatMap(graft.sources.ManifestFileIndex.translate)
        new graft.sources.ManifestFileIndex(underlying, dataSchema, fsRel.sparkSession, extra)
      }
    }
    val newRel = fsRel.copy(
      dataSchema = schema,
      location = manifestLoc,
      fileFormat = new FourMcStatsFileFormat(dataSchema, dataPreds, cols))(fsRel.sparkSession)
    val nnAttrs: Seq[AttributeReference] =
      cols.map(c => AttributeReference(s"_nn_$c", LongType, nullable = false)())
    val cntAttr = AttributeReference("_cnt", LongType, nullable = false)()
    // the group fields reuse the ORIGINAL attributes (same exprIds), so the
    // Aggregate's grouping keys and value aggregates resolve untouched
    val newLr = LogicalRelation(newRel, (gOrigs ++ nnAttrs :+ cntAttr) ++ origPartAttrs,
      None, isStreaming = false, stream = None)

    val newAggs: Seq[NamedExpression] = outs.map {
      case Pass(ne) => ne
      case Agg(al, req) =>
        val rewritten: Expression = req match {
          case GCnt =>
            Coalesce(Seq(
              AggregateExpression(Sum(cntAttr), Complete, isDistinct = false),
              Literal(0L, LongType)))
          case GNn(g) =>
            Coalesce(Seq(
              AggregateExpression(Sum(nnAttrs(g)), Complete, isDistinct = false),
              Literal(0L, LongType)))
          case GMin(g) => AggregateExpression(Min(gOrigs(g)), Complete, isDistinct = false)
          case GMax(g) => AggregateExpression(Max(gOrigs(g)), Complete, isDistinct = false)
          case GDistinct(g) =>
            AggregateExpression(Count(Seq(gOrigs(g))), Complete, isDistinct = true)
        }
        Alias(rewritten, al.name)(exprId = al.exprId, qualifier = al.qualifier,
          explicitMetadata = Some(al.metadata))
    }
    val newChild: LogicalPlan = partFilter.map(Filter(_, newLr)).getOrElse(newLr)
    Some(Aggregate(groups, newAggs, newChild))
  }

  /** Strip attr-only Projects and deterministic Filters off the scan;
    * collects at most the conjunction of the filters seen (all must later
    * prove partition-only).
    */
  private def destructure(p: LogicalPlan): Option[(LogicalRelation, Option[Expression])] =
    p match {
      case lr: LogicalRelation => Some((lr, None))
      case Project(ps, c) if ps.forall(_.isInstanceOf[AttributeReference]) =>
        destructure(c)
      case Filter(cond, c) if cond.deterministic =>
        destructure(c).map { case (lr, f) =>
          (lr, Some(f.map(org.apache.spark.sql.catalyst.expressions.And(_, cond)).getOrElse(cond)))
        }
      case _ => None
    }

  /** One requested aggregate: Min/Max/Sum(col) / Count(*) / Count(col). */
  private sealed trait Req
  private case class ReqMin(col: Int) extends Req
  private case class ReqMax(col: Int) extends Req
  private case class ReqNn(col: Int) extends Req
  private case class ReqSum(col: Int,
      ctx: org.apache.spark.sql.catalyst.expressions.NumericEvalContext) extends Req
  private case class ReqAvg(col: Int) extends Req
  private case object ReqCnt extends Req

  private def tryRewrite(
      groups: Seq[AttributeReference],
      aggExprs: Seq[NamedExpression],
      lr: LogicalRelation,
      filterCond: Option[Expression]): Option[LogicalPlan] = {
    val fsRel = lr.relation match {
      case r: HadoopFsRelation if r.fileFormat.isInstanceOf[FourMcFileFormat] => r
      case _ => return None
    }
    val opts = fsRel.options
    if (opts.getOrElse("payload", "text") != "csv") return None
    if (!opts.getOrElse("blockStats", "true").toBoolean) return None
    if (opts.get("ignoreCorruptBlocks").exists(_.toBoolean)) return None
    if (opts.contains(RuntimeKeyFilter.OptionKey)) return None

    val dataSchema = fsRel.dataSchema
    val partNames = fsRel.partitionSchema.fieldNames.toSet
    // the ORIGINAL relation's partition attributes, exprIds intact: group
    // exprs, partition filters, and group-column passthroughs keep
    // resolving against the rewritten relation
    val origPartAttrs: Seq[AttributeReference] =
      lr.output.collect { case a: AttributeReference if partNames.contains(a.name) => a }
    val partAttrSet = org.apache.spark.sql.catalyst.expressions.AttributeSet(origPartAttrs)

    // Dict-group mode (r16, two-column r17): grouping may additionally
    // include up to TWO data columns — STRING columns answered from v4
    // per-column histograms (one column) or v5 JOINT histograms (two: q1's
    // `GROUP BY returnflag, linestatus` shape) — zero blocks decompressed
    // on covered files. A COUNT(DISTINCT strcol) rides the same relation
    // whether or not its column is a grouping key, as long as group ∪
    // distinct columns stay within the two dict-answerable slots.
    val dataGroups = groups.filterNot(partAttrSet.contains)
    if (dataGroups.length > 2) return None
    def stringColOf(a: AttributeReference): Option[Int] =
      if (partNames.contains(a.name)) None
      else {
        val i = dataSchema.fieldNames.indexOf(a.name)
        if (i < 0) None
        else scala.util.Try(graft.sources.CsvPayload.tagOf(dataSchema.fields(i).dataType))
          .toOption.filter(_ == graft.sources.CsvPayload.TagString).map(_ => i)
      }
    val groupCols: Seq[Int] =
      dataGroups.map(a => stringColOf(a).getOrElse(return None))
    // any DISTINCT aggregate forces dict mode (the non-group path refuses
    // them): only unfiltered COUNT(DISTINCT strcol) is supported
    val distinctCols: Seq[Int] = aggExprs.flatMap {
      case Alias(ae: AggregateExpression, _) if ae.isDistinct =>
        if (ae.filter.nonEmpty) return None
        ae.aggregateFunction match {
          case Count(Seq(a: AttributeReference)) =>
            Seq(stringColOf(a).getOrElse(return None))
          case _ => return None
        }
      case _ => Nil
    }
    val dictCols: Seq[Int] = (groupCols ++ distinctCols).distinct
    if (dictCols.length > 2) return None
    if (dictCols.nonEmpty) {
      // Filters compose (r17): partition conjuncts stay a logical Filter
      // above the rewritten relation (directory pruning commutes); data
      // conjuncts compile to zone-map range predicates pushed into the
      // stats format, which emits histogram rows for blocks the zone map
      // proves wholly inside the predicate, skips wholly-outside blocks,
      // and decodes + re-filters only straddlers — `GROUP BY returnflag
      // WHERE shipdate >= X` is footer-only on the all-pass span of a
      // sorted table. An uncompilable data conjunct refuses the rewrite.
      val conjuncts0 = filterCond.map(splitConjunction).getOrElse(Nil)
      val (partConj0, dataConj0) = conjuncts0.partition(_.references.subsetOf(partAttrSet))
      val dictPreds: Seq[StatsPred] = dataConj0.map { c =>
        compileDataPred(c, dataSchema, partNames).getOrElse(return None)
      }
      if (!dictEnabled) return None
      if (!probeDictCoverage(fsRel, dictCols.sorted)) return None
      return tryDictGroupRewrite(groups, aggExprs, lr, fsRel, dataSchema,
        origPartAttrs, partConj0.reduceOption(And.apply), dictCols, dictPreds, dataConj0)
    }

    // grouping only by partition columns
    if (!groups.forall(partAttrSet.contains)) return None
    // Filters: partition conjuncts stay a logical Filter above the stats
    // relation (directory pruning commutes — both scans list the same
    // pruned file set). DATA conjuncts must each compile to a zone-map
    // range predicate (col <cmp> literal / IS NOT NULL on a non-string
    // data column); they're pushed into the stats format, which classifies
    // every owned block as all-rows-pass (stats row), none-pass (skipped),
    // or straddling (decoded + re-filtered per line). Any conjunct that
    // doesn't compile refuses the whole rewrite — the normal scan's own
    // block pruning handles it instead.
    val conjuncts = filterCond.map(splitConjunction).getOrElse(Nil)
    val (partConj, dataConj) = conjuncts.partition(_.references.subsetOf(partAttrSet))
    val dataPreds: Seq[StatsPred] = dataConj.map { c =>
      compileDataPred(c, dataSchema, partNames).getOrElse(return None)
    }
    val partFilter: Option[Expression] = partConj.reduceOption(And.apply)
    val groupSet = org.apache.spark.sql.catalyst.expressions.AttributeSet(groups)

    def colOf(e: Expression): Option[Int] = e match {
      case a: AttributeReference if !partNames.contains(a.name) =>
        val i = dataSchema.fieldNames.indexOf(a.name)
        if (i < 0) None
        else scala.util.Try(graft.sources.CsvPayload.tagOf(dataSchema.fields(i).dataType))
          .toOption
          // array columns carry no zone/sum stats (hasBounds=false by
          // construction) and the stats relation's per-line decode fallback
          // doesn't parse them — refuse, keep the normal scan
          .filter(t => !graft.sources.CsvPayload.isArrayTag(t))
          .map(_ => i)
      case _ => None
    }

    // every output must be a grouping-column passthrough or an
    // Alias(AggregateExpression(min/max/count)) — any other shape
    // (expressions over aggregates, distinct, agg filters, other
    // functions) keeps the normal scan
    sealed trait Out
    case class Pass(ne: NamedExpression) extends Out
    case class Agg(al: Alias, req: Req) extends Out
    val outs: Seq[Out] = aggExprs.map {
      case a: AttributeReference if groupSet.contains(a) => Pass(a)
      case al @ Alias(a: AttributeReference, _) if groupSet.contains(a) => Pass(al)
      case al @ Alias(ae: AggregateExpression, _)
          if !ae.isDistinct && ae.filter.isEmpty =>
        ae.aggregateFunction match {
          case Min(c)                    => colOf(c).map(i => Agg(al, ReqMin(i))).getOrElse(return None)
          case Max(c)                    => colOf(c).map(i => Agg(al, ReqMax(i))).getOrElse(return None)
          // non-null literal only: COUNT(NULL) is 0, not the row count.
          // NullPropagation folds it earlier today, but relying on batch
          // ordering would be an implicit dependency — guard locally.
          case Count(Seq(Literal(v, _))) if v != null => Agg(al, ReqCnt)
          case Count(Seq(c))             => colOf(c).map(i => Agg(al, ReqNn(i))).getOrElse(return None)
          // SUM from v2 per-block sums (`BlockStats`): integer columns store
          // overflow-checked exact long sums (an overflowing block stores no
          // sum and decodes instead), double/float the row-ordered double
          // sum, so re-summing the block partials IS the partial-then-combine
          // arithmetic Spark's own hash aggregate runs — valid under LEGACY
          // and ANSI alike (the rewritten Sum keeps the original eval
          // context, so ANSI combine overflow still errors). TRY mode is
          // refused (null-on-overflow needs the scan's own TrySum). Old v1
          // segments have no sums — those blocks decode per line
          // (statsUsable gates on FlagHasSum), staying value-exact.
          // Decimal children (r13 verdict #3): blocks store EXACT unscaled
          // long sums (overflow-poisoned blocks decode instead), emitted by
          // the stats relation as DecimalType(p+10, s) partials — always
          // representable, since a block's sum has at most p+7 digits. The
          // rewrite re-sums the partials under the original eval context and
          // casts back to Sum's own result type DecimalType(p+10, s): the
          // cast overflows (ANSI error / LEGACY null) exactly when the plain
          // scan's Sum would have.
          case s: Sum if s.evalContext.evalMode !=
              org.apache.spark.sql.catalyst.expressions.EvalMode.TRY =>
            colOf(s.child).filter { i =>
              val t = graft.sources.CsvPayload.tagOf(dataSchema.fields(i).dataType)
              graft.format.BlockStats.sumKindOf(t) != 0
            }.map(i => Agg(al, ReqSum(i, s.evalContext))).getOrElse(return None)
          // AVG over a double/float column decomposes into Sum(_sum)/Sum(_nn)
          // — the SAME Divide-of-double-sum-by-count Average's own
          // evaluateExpression runs, so the arithmetic shape is preserved.
          // Integral children are refused: Average accumulates their sum as
          // a per-row DOUBLE, which our exact long block sums don't mirror
          // bit-for-bit (SUM/COUNT cover that shape exactly instead).
          case org.apache.spark.sql.catalyst.expressions.aggregate.Average(c, evalMode)
              if evalMode != org.apache.spark.sql.catalyst.expressions.EvalMode.TRY =>
            colOf(c).filter { i =>
              val t = graft.sources.CsvPayload.tagOf(dataSchema.fields(i).dataType)
              t == graft.sources.CsvPayload.TagDouble || t == graft.sources.CsvPayload.TagFloat
            }.map(i => Agg(al, ReqAvg(i))).getOrElse(return None)
          case _                         => return None
        }
      case _ => return None
    }
    val reqs: Seq[(Alias, Req)] = outs.collect { case Agg(al, r) => (al, r) }
    if (reqs.isEmpty) return None
    // all-COUNT(*) requests WITHOUT a data filter: the reader metadata-count
    // fast path already answers them (including grouped-by-partition and
    // partition-filtered forms — empty projection + constant partition
    // vectors). With a data filter the fast path doesn't apply, and the
    // stats route still skips decoding every wholly-inside block.
    if (dataPreds.isEmpty && reqs.forall(_._2 == ReqCnt)) {
      // r16: a bare, unfiltered, ungrouped COUNT(*) collapses further when
      // a directory manifest FULLY covers the listed files — from one
      // footer task per file to ZERO tasks: Σ exact per-file line totals,
      // matched by (path, len, modTime) so any content change refuses.
      if (groups.isEmpty && filterCond.isEmpty && manifestCountEnabled &&
          !fsRel.options.get("acceptAnyExtension").exists(_.toBoolean)) {
        manifestExactCount(fsRel).foreach { total =>
          val newOut: Seq[NamedExpression] = outs.map {
            case Agg(al, ReqCnt) =>
              Alias(Literal(total, LongType), al.name)(exprId = al.exprId,
                qualifier = al.qualifier, explicitMetadata = Some(al.metadata))
            case _ => return None
          }
          return Some(org.apache.spark.sql.catalyst.plans.logical.Project(newOut,
            org.apache.spark.sql.catalyst.plans.logical.OneRowRelation()))
        }
      }
      return None
    }

    // build the synthetic stats relation
    val boundReqs = reqs.map(_._2).collect { case ReqMin(i) => i; case ReqMax(i) => i }
    val cols = boundReqs.distinct.sorted
    val targets = cols.map { i =>
      (i, reqs.exists(_._2 == ReqMin(i)), reqs.exists(_._2 == ReqMax(i)))
    }
    val nnCols = reqs.map(_._2).collect {
      case ReqNn(i) => i
      case ReqAvg(i) => i // AVG divides by the non-null count
    }.distinct.sorted
    val sumCols = reqs.map(_._2).collect {
      case ReqSum(i, _) => i
      case ReqAvg(i) => i
    }.distinct.sorted
    val schema = FourMcStatsFileFormat.statsSchema(dataSchema, targets, nnCols, sumCols)
    // compose with directory-manifest FILE pruning: the stats relation
    // evaluates its data predicates inside the format, so the scan has no
    // plan-level filters to hand the index — carry the compiled conjuncts
    // statically instead ([[graft.sources.ManifestFileIndex]]). Fully
    // refuted files never launch a task, pushdown or not.
    val manifestLoc = {
      val underlying = fsRel.location match {
        case m: graft.sources.ManifestFileIndex => m.underlying
        case other                              => other
      }
      val pruningOn = org.apache.spark.sql.internal.SQLConf.get
        .getConfString("spark.graft.fourmc.manifestPruning", "true").toBoolean
      if (!pruningOn) underlying
      else {
        val extra = dataConj.flatMap(graft.sources.ManifestFileIndex.translate)
        new graft.sources.ManifestFileIndex(underlying, dataSchema, fsRel.sparkSession, extra)
      }
    }
    val newRel = fsRel.copy(
      dataSchema = schema,
      location = manifestLoc,
      fileFormat = new FourMcStatsFileFormat(dataSchema, dataPreds))(fsRel.sparkSession)
    val dataAttrs: Seq[AttributeReference] =
      schema.fields.map(f => AttributeReference(f.name, f.dataType, f.nullable)()).toSeq
    val newLr = LogicalRelation(newRel, dataAttrs ++ origPartAttrs, None,
      isStreaming = false, stream = None)
    def attr(name: String): AttributeReference = dataAttrs.find(_.name == name).get

    val newAggs: Seq[NamedExpression] = outs.map {
      case Pass(ne) => ne
      case Agg(al, req) =>
        val rewritten: Expression = req match {
          case ReqMin(i) =>
            AggregateExpression(Min(attr(s"_min_$i")), Complete, isDistinct = false)
          case ReqMax(i) =>
            AggregateExpression(Max(attr(s"_max_$i")), Complete, isDistinct = false)
          case ReqNn(i) =>
            // Sum is null on zero rows; COUNT of an empty group set is 0
            Coalesce(Seq(
              AggregateExpression(Sum(attr(s"_nn_$i")), Complete, isDistinct = false),
              Literal(0L, LongType)))
          case ReqSum(i, ctx) =>
            // SUM of zero rows is null — exactly Sum's own semantics, no
            // Coalesce. `_sum_<i>` is already in Sum's result domain (long
            // for int/long columns, double for double/float), so re-summing
            // the per-block partials under the ORIGINAL eval context is the
            // same arithmetic a plain scan's partial aggregation runs.
            // Decimal partials ride DecimalType(p+10, s); the outer Sum
            // widens 10 more digits, so cast back to the original result
            // type — overflow there (ANSI error / LEGACY null) reproduces
            // the plain scan's own overflow point.
            val inner = AggregateExpression(Sum(attr(s"_sum_$i"), ctx), Complete, isDistinct = false)
            if (dataSchema.fields(i).dataType
                .isInstanceOf[org.apache.spark.sql.types.DecimalType])
              org.apache.spark.sql.catalyst.expressions.Cast(
                inner, al.child.dataType, None,
                if (ctx.evalMode == org.apache.spark.sql.catalyst.expressions.EvalMode.ANSI)
                  org.apache.spark.sql.catalyst.expressions.EvalMode.ANSI
                else org.apache.spark.sql.catalyst.expressions.EvalMode.LEGACY)
            else inner
          case ReqAvg(i) =>
            // Average(double) evaluates as Divide(double sum, count, LEGACY)
            // internally — mirror it over the block partials. All-null input:
            // Sum(_sum) is null → null, matching AVG's empty/all-null result.
            org.apache.spark.sql.catalyst.expressions.Divide(
              AggregateExpression(Sum(attr(s"_sum_$i")), Complete, isDistinct = false),
              org.apache.spark.sql.catalyst.expressions.Cast(
                Coalesce(Seq(
                  AggregateExpression(Sum(attr(s"_nn_$i")), Complete, isDistinct = false),
                  Literal(0L, LongType))),
                org.apache.spark.sql.types.DoubleType),
              org.apache.spark.sql.catalyst.expressions.EvalMode.LEGACY)
          case ReqCnt =>
            Coalesce(Seq(
              AggregateExpression(Sum(attr("_cnt")), Complete, isDistinct = false),
              Literal(0L, LongType)))
        }
        Alias(rewritten, al.name)(exprId = al.exprId, qualifier = al.qualifier,
          explicitMetadata = Some(al.metadata))
    }
    val newChild: LogicalPlan = partFilter.map(Filter(_, newLr)).getOrElse(newLr)
    Some(Aggregate(groups, newAggs, newChild))
  }

  private def splitConjunction(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjunction(l) ++ splitConjunction(r)
    case other     => Seq(other)
  }

  /** Compile one data-column conjunct to a [[StatsPred]], or None if its
    * shape/type is outside the pushable set. Strings are excluded (their
    * stored bounds may be 16-byte truncations — range proofs over prefixes
    * are subtle enough to be a follow-up, and the normal scan's pruning
    * already handles them); double/float equality is excluded (zone/line
    * comparison uses the total order, where -0.0 < 0.0, but Catalyst's
    * EqualTo treats them equal).
    */
  private def compileDataPred(
      e: Expression,
      dataSchema: org.apache.spark.sql.types.StructType,
      partNames: Set[String]): Option[StatsPred] = {
    import graft.sources.CsvPayload
    import FourMcStatsFileFormat._
    def colInfo(a: AttributeReference): Option[(Int, Int)] =
      if (partNames.contains(a.name)) None
      else {
        val i = dataSchema.fieldNames.indexOf(a.name)
        if (i < 0) None
        else scala.util.Try(CsvPayload.tagOf(dataSchema.fields(i).dataType)).toOption
          .filter(t => t != CsvPayload.TagString && !CsvPayload.isArrayTag(t))
          .map(t => (i, t))
      }
    def mk(a: AttributeReference, v: Any, op: Int): Option[StatsPred] =
      colInfo(a).flatMap { case (i, tag) =>
        (tag, v) match {
          case (CsvPayload.TagLong, l: Long)       => Some(StatsPred(i, op, isDouble = false, l, 0d))
          case (CsvPayload.TagTimestamp, l: Long)  => Some(StatsPred(i, op, isDouble = false, l, 0d))
          case (CsvPayload.TagInt, n: Int)         => Some(StatsPred(i, op, isDouble = false, n.toLong, 0d))
          case (CsvPayload.TagBoolean, b: Boolean) => Some(StatsPred(i, op, isDouble = false, if (b) 1L else 0L, 0d))
          case (CsvPayload.TagDouble, d: Double) if op != OpEq =>
            Some(StatsPred(i, op, isDouble = true, 0L, d))
          case (CsvPayload.TagFloat, f: Float) if op != OpEq =>
            Some(StatsPred(i, op, isDouble = true, 0L, f.toDouble))
          case (CsvPayload.TagDate, n: Int) => Some(StatsPred(i, op, isDouble = false, n.toLong, 0d))
          // decimal literal must sit on the column's own scale for the
          // unscaled-long comparison to be exact; Catalyst usually arranges
          // exactly that for same-type comparisons, anything else refuses
          case (CsvPayload.TagDecimal, d: org.apache.spark.sql.types.Decimal)
              if d.scale == CsvPayload.scaleOf(dataSchema.fields(i).dataType) =>
            Some(StatsPred(i, op, isDouble = false, d.toUnscaledLong, 0d))
          case _ => None
        }
      }
    e match {
      case IsNotNull(a: AttributeReference) =>
        colInfo(a).map { case (i, _) => StatsPred(i, OpNotNull, isDouble = false, 0L, 0d) }
      case GreaterThanOrEqual(a: AttributeReference, Literal(v, _)) if v != null => mk(a, v, OpGe)
      case GreaterThanOrEqual(Literal(v, _), a: AttributeReference) if v != null => mk(a, v, OpLe)
      case GreaterThan(a: AttributeReference, Literal(v, _)) if v != null        => mk(a, v, OpGt)
      case GreaterThan(Literal(v, _), a: AttributeReference) if v != null        => mk(a, v, OpLt)
      case LessThanOrEqual(a: AttributeReference, Literal(v, _)) if v != null    => mk(a, v, OpLe)
      case LessThanOrEqual(Literal(v, _), a: AttributeReference) if v != null    => mk(a, v, OpGe)
      case LessThan(a: AttributeReference, Literal(v, _)) if v != null           => mk(a, v, OpLt)
      case LessThan(Literal(v, _), a: AttributeReference) if v != null           => mk(a, v, OpGt)
      case EqualTo(a: AttributeReference, Literal(v, _)) if v != null            => mk(a, v, OpEq)
      case EqualTo(Literal(v, _), a: AttributeReference) if v != null            => mk(a, v, OpEq)
      case _ => None
    }
  }
}
