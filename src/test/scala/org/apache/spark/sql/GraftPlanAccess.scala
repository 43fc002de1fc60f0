package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Test-only bridge into `private[sql]`: build a DataFrame over an
  * arbitrary analyzed logical plan, so PlanSpec can row-count the
  * INPUT of specific operators (e.g. each unpartitioned Window's
  * child) instead of eyeballing engine warnings. Lives in the Spark
  * package namespace purely to satisfy the access check; test
  * classpath only. */
object GraftPlanAccess {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
