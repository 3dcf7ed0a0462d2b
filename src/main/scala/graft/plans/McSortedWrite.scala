package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Ascending, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, RepartitionByExpression, Sort}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.InsertIntoHadoopFsRelationCommand

import graft.sources.FourMcFileFormat

/** `df.write.format("4mc").option("sortBy", "l_shipdate").save(dir)` — the
  * public writer knob for SORT-CLUSTERED 4mc/4mz files (round 15, promoting
  * what the bench fixtures did by hand via `repartitionByRange` +
  * `sortWithinPartitions`).
  *
  * A FileFormat cannot reorder the rows Spark hands its writers, so the knob
  * is implemented where layout decisions belong in Spark: a logical rule
  * over the V1 write command. When an [[InsertIntoHadoopFsRelationCommand]]
  * targets the 4mc format with a `sortBy` option, the command's query gains
  *
  * {{{ Sort(keys, global = false, RepartitionByExpression(keys, query)) }}}
  *
  * i.e. a RANGE shuffle on the sort keys (each task owns a disjoint key
  * range — at 100 TB this is what makes per-FILE key ranges disjoint, not
  * just per-block) followed by a within-task sort. The per-block zone maps
  * written by the stats segment then actually separate blocks, so selective
  * scans skip whole blocks before decompression and all-pass blocks elide
  * per-row predicate evaluation ([[graft.format.McStatsPruning]]).
  *
  * Composition rules:
  *  - `partitionBy` columns (hive-style dirs) lead the clustering keys, so
  *    the write never produces more open files per task than the plain
  *    partitioned write would; the physical writer's own required-ordering
  *    check remains the correctness backstop either way.
  *  - multiple keys: `option("sortBy", "a,b")` sorts lexicographically.
  *  - `option("sortPartitions", n)` overrides the shuffle width (default:
  *    `spark.sql.shuffle.partitions`, AQE may coalesce).
  *
  * Registered as a PRE-CBO rule (a Once batch after operator optimization):
  * the operator-optimization fixpoint — where EliminateSorts lives — has
  * already run, so the injected Sort survives to the physical plan, and the
  * rule never sees its own output twice.
  *
  * Disable with `spark.graft.fourmc.sortedWrite.enabled=false` (the option
  * is then ignored, matching a session without the extensions — the option
  * is advisory layout tuning, never load-bearing for correctness).
  */
object McSortedWrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString("spark.graft.fourmc.sortedWrite.enabled", "true").toBoolean) return plan
    plan.transformDown {
      case cmd: InsertIntoHadoopFsRelationCommand
          if cmd.fileFormat.isInstanceOf[FourMcFileFormat] &&
            cmd.options.get("sortBy").exists(_.trim.nonEmpty) =>
        val names = cmd.options("sortBy").split(',').map(_.trim).filter(_.nonEmpty)
        val resolver = conf.resolver
        val sortAttrs = names.map { n =>
          cmd.query.output.find(a => resolver(a.name, n)).getOrElse(
            throw new IllegalArgumentException(
              s"sortBy: no such column '$n' (have ${cmd.query.output.map(_.name).mkString(", ")})"))
        }
        // partition dirs lead: rows for one hive partition stay contiguous
        // within a task, so the sorted write opens the same number of
        // concurrent files as an unsorted partitioned write
        val keys = (cmd.partitionColumns ++ sortAttrs).distinct
        val order = keys.map(SortOrder(_, Ascending))
        val nParts = cmd.options.get("sortPartitions").map { s =>
          val n = s.toInt
          require(n > 0, s"sortPartitions must be positive, got $n")
          n
        }
        val clustered = Sort(order, global = false,
          RepartitionByExpression(order, cmd.query, nParts))
        cmd.copy(query = clustered)
    }
  }
}
