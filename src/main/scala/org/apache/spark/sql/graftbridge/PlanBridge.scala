package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** `Dataset.ofRows` is `private[sql]` in Spark 4; graft's planner rules
  * need it to execute a build-side subplan eagerly (the same move Spark's
  * own dynamic partition pruning makes when no exchange is reusable). Same
  * rationale as [[ColumnBridge]]: a minimal re-export, not a fork.
  */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
