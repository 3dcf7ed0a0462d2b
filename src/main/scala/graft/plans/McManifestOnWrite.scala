package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.command.DataWritingCommand
import org.apache.spark.sql.execution.datasources.InsertIntoHadoopFsRelationCommand

import graft.sources.FourMcFileFormat

/** `df.write.format("4mc").option("manifest", "true").save(dir)` — manifest
  * maintenance on the ORDINARY write path (round 17).
  *
  * Before this rule, a directory pruning manifest
  * ([[graft.format.McManifest]]) appeared only via the CLI (`graft.Tool -m`),
  * typed compaction, or the streaming batch commit — a plain batch write
  * left the dir manifest-less, so driver-side file pruning and the zero-task
  * COUNT(*) rewrite silently didn't apply until someone ran a refresh. With
  * the option, the write command is wrapped so that AFTER the job commits
  * (all task files renamed into place, `_SUCCESS` semantics unchanged) the
  * manifest is written/refreshed in the same driver call. Appends compose:
  * the refresh reuses every existing entry whose `(path, len, modTime)`
  * still matches and reads only the NEW files' footers — steady-state cost
  * is proportional to the batch, not the directory.
  *
  * Failure posture matches the streaming commit: the refresh is best-effort
  * AFTER a successful commit — an exception there logs and leaves a stale or
  * absent manifest, which every consumer treats as "keep the file" /
  * "no pruning", never a wrong answer. A FAILED write never refreshes, so a
  * pre-existing manifest keeps matching only the surviving files.
  *
  * Registered as a PRE-CBO rule after [[McSortedWrite]] (same batch, so a
  * `sortBy` + `manifest` write first gains its range-shuffle clustering and
  * is then wrapped). Disable with
  * `spark.graft.fourmc.manifestOnWrite.enabled=false` — the option is then
  * ignored, matching a session without the extensions.
  */
object McManifestOnWrite extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString("spark.graft.fourmc.manifestOnWrite.enabled", "true").toBoolean)
      return plan
    plan.transformDown {
      case cmd: InsertIntoHadoopFsRelationCommand
          if cmd.fileFormat.isInstanceOf[FourMcFileFormat] &&
            cmd.options.get("manifest").exists(_.trim.equalsIgnoreCase("true")) =>
        McManifestedWrite(cmd)
    }
  }
}

/** The wrapped write: delegates the full V1 insert (committer, dynamic
  * partition handling, metrics) to the inner command, then refreshes the
  * target directory's manifest. The inner command is a FIELD, not a child —
  * the planner sees one write command whose child is the data query.
  */
case class McManifestedWrite(cmd: InsertIntoHadoopFsRelationCommand)
    extends DataWritingCommand {

  override def query: LogicalPlan = cmd.query
  override def outputColumnNames: Seq[String] = cmd.outputColumnNames
  override lazy val metrics = cmd.metrics

  // Spark 4's V1 write commands live in the `classic` half of the session
  // split — DataWritingCommand.run is declared against the classic type
  override def run(
      sparkSession: org.apache.spark.sql.classic.SparkSession,
      child: SparkPlan): Seq[Row] = {
    val rows = cmd.run(sparkSession, child)
    // commit succeeded: refresh the manifest over the final file set (the
    // recursive walk skips hidden dirs, so a concurrent writer's
    // _temporary files are never recorded)
    try {
      graft.format.McManifest.write(
        cmd.outputPath.toString,
        sparkSession.sessionState.newHadoopConfWithOptions(cmd.options))
      ()
    } catch {
      case scala.util.control.NonFatal(e) =>
        logWarning(s"4mc manifest refresh after write failed (pruning degrades " +
          s"to plain listing until the next refresh): ${e.getMessage}")
    }
    rows
  }

  override protected def withNewChildInternal(newChild: LogicalPlan): McManifestedWrite =
    copy(cmd = cmd.copy(query = newChild))
}
