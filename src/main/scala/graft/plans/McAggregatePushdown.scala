package graft.plans

import graft.sources.{FourMcFileFormat, FourMcStatsFileFormat, RuntimeKeyFilter}

import org.apache.spark.sql.catalyst.expressions.{
  Alias, AttributeReference, Coalesce, Expression, Literal, NamedExpression
}
import org.apache.spark.sql.catalyst.expressions.aggregate.{
  AggregateExpression, Complete, Count, Max, Min, Sum
}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.LongType

/** MIN/MAX/COUNT(*) aggregate pushdown from 4mc zone maps — the planner
  * rule that makes `SELECT min(ts), max(ts), count(*) FROM fourmc_table`
  * a footer sweep instead of a full scan (parquet answers the same shapes
  * from row-group metadata via its aggregate pushdown; the 4mc analog is
  * the per-block stats segment, `graft/format/BlockStats.scala`).
  *
  * Matches a GLOBAL aggregate (no grouping, no Filter below) whose every
  * output is `min(col)`, `max(col)`, or `count(*)` over data columns of an
  * unfiltered 4mc csv scan, with at least one min/max (a bare COUNT(*)
  * already has the metadata-count fast path in the row/vectorized readers).
  * Rewrites the child to a [[FourMcStatsFileFormat]] relation that emits
  * one `(min…, max…, cnt)` row per owned BLOCK from the footer stats —
  * falling back to per-line decode only for blocks whose stats cannot
  * answer exactly (NaN-poisoned doubles, truncated string bounds,
  * stats-off files) — and the aggregate to `min(min)`/`max(max)`/
  * `coalesce(sum(cnt), 0)`, preserving the original output names and
  * exprIds so the query's schema is untouched.
  *
  * Refuses: grouped/filtered/distinct aggregates, partition columns,
  * permissive scans (corrupt-block skipping changes counts), scans with a
  * runtime key filter (its semi-join semantics don't commute with a global
  * aggregate), non-csv payloads. Disable with
  * `spark.graft.fourmc.aggPushdown=false`.
  */
object McAggregatePushdown extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg @ Aggregate(Nil, aggExprs, child, _) if enabled =>
      val relOpt = child match {
        case lr: LogicalRelation => Some(lr)
        case Project(ps, lr: LogicalRelation) if ps.forall(_.isInstanceOf[AttributeReference]) =>
          Some(lr)
        case _ => None
      }
      relOpt.flatMap(tryRewrite(aggExprs, _)).getOrElse(agg)
  }

  private def enabled: Boolean =
    org.apache.spark.sql.internal.SQLConf.get
      .getConfString("spark.graft.fourmc.aggPushdown", "true").toBoolean

  /** One requested aggregate: Min(col) / Max(col) / Count(*). */
  private sealed trait Req
  private case class ReqMin(col: Int) extends Req
  private case class ReqMax(col: Int) extends Req
  private case object ReqCnt extends Req

  private def tryRewrite(aggExprs: Seq[NamedExpression], lr: LogicalRelation): Option[LogicalPlan] = {
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

    def colOf(e: Expression): Option[Int] = e match {
      case a: AttributeReference if !partNames.contains(a.name) =>
        val i = dataSchema.fieldNames.indexOf(a.name)
        if (i < 0) None
        else scala.util.Try(graft.sources.CsvPayload.tagOf(dataSchema.fields(i).dataType))
          .toOption.map(_ => i)
      case _ => None
    }

    // every output must be Alias(AggregateExpression(min/max/count)) — any
    // other shape (expressions over aggregates, distinct, agg filters,
    // other functions) keeps the normal scan
    val reqs: Seq[(Alias, Req)] = aggExprs.map {
      case al @ Alias(ae: AggregateExpression, _)
          if !ae.isDistinct && ae.filter.isEmpty =>
        ae.aggregateFunction match {
          case Min(c)                  => colOf(c).map(i => (al, ReqMin(i): Req)).getOrElse(return None)
          case Max(c)                  => colOf(c).map(i => (al, ReqMax(i): Req)).getOrElse(return None)
          case Count(Seq(Literal(_, _))) => (al, ReqCnt)
          case _                       => return None
        }
      case _ => return None
    }
    if (!reqs.exists(r => r._2 != ReqCnt)) return None // bare COUNT(*): reader fast path

    // build the synthetic stats relation
    val cols = reqs.map(_._2).collect { case ReqMin(i) => i; case ReqMax(i) => i }.distinct.sorted
    val targets = cols.map { i =>
      (i, reqs.exists(_._2 == ReqMin(i)), reqs.exists(_._2 == ReqMax(i)))
    }
    val schema = FourMcStatsFileFormat.statsSchema(dataSchema, targets)
    val newRel = fsRel.copy(
      dataSchema = schema,
      fileFormat = new FourMcStatsFileFormat(dataSchema))(fsRel.sparkSession)
    val dataAttrs: Seq[AttributeReference] =
      schema.fields.map(f => AttributeReference(f.name, f.dataType, f.nullable)()).toSeq
    val partAttrs: Seq[AttributeReference] =
      fsRel.partitionSchema.fields.map(f => AttributeReference(f.name, f.dataType, f.nullable)()).toSeq
    val newLr = LogicalRelation(newRel, dataAttrs ++ partAttrs, None,
      isStreaming = false, stream = None)
    def attr(name: String): AttributeReference = dataAttrs.find(_.name == name).get

    val newAggs: Seq[NamedExpression] = reqs.map { case (al, req) =>
      val rewritten: Expression = req match {
        case ReqMin(i) =>
          AggregateExpression(Min(attr(s"_min_$i")), Complete, isDistinct = false)
        case ReqMax(i) =>
          AggregateExpression(Max(attr(s"_max_$i")), Complete, isDistinct = false)
        case ReqCnt =>
          // Sum is null on zero rows; COUNT(*) of an empty table is 0
          Coalesce(Seq(
            AggregateExpression(Sum(attr("_cnt")), Complete, isDistinct = false),
            Literal(0L, LongType)))
      }
      Alias(rewritten, al.name)(exprId = al.exprId, qualifier = al.qualifier,
        explicitMetadata = Some(al.metadata))
    }
    Some(Aggregate(Nil, newAggs, newLr))
  }
}
