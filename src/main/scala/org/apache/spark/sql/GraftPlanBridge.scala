package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Package-placed bridge to `classic.Dataset.ofRows` — the blessed
  * internal constructor for "DataFrame from a custom LogicalPlan", which
  * Spark scopes `private[sql]`. Every extension library that introduces
  * its own logical operators (Delta, Iceberg's Spark module, frameless)
  * ships exactly this one-liner; graft uses it solely to expose
  * [[graft.plans.TopKPerGroupNode]] as a DataFrame. Nothing else in the
  * repo lives outside the `graft` namespace. */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
