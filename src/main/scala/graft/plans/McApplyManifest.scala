package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

import graft.sources.{FourMcFileFormat, ManifestFileIndex}

/** Wraps every 4mc relation's [[org.apache.spark.sql.execution.datasources
  * .FileIndex]] in a [[ManifestFileIndex]], enabling driver-side FILE
  * pruning from the directory's `_graft_manifest` sidecar. The wrap is
  * unconditional and idempotent — all manifest lookups happen lazily in
  * `listFiles` (one `getFileStatus` per root per query, cached parse), so
  * directories without a manifest pay one existence check and nothing else.
  * Disable with `spark.graft.fourmc.manifestPruning=false`.
  */
object McApplyManifest extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transform {
      case lr @ LogicalRelation(fsRel: HadoopFsRelation, _, _, _, _)
          if fsRel.fileFormat.isInstanceOf[FourMcFileFormat] &&
            !fsRel.location.isInstanceOf[ManifestFileIndex] =>
        val wrapped = fsRel.copy(location =
          new ManifestFileIndex(fsRel.location, fsRel.dataSchema, fsRel.sparkSession)
        )(fsRel.sparkSession)
        lr.copy(relation = wrapped)
    }
  }

  private def enabled: Boolean =
    org.apache.spark.sql.internal.SQLConf.get
      .getConfString("spark.graft.fourmc.manifestPruning", "true").toBoolean
}
