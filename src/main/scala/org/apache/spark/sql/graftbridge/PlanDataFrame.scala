package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Compile-time bridge to `classic.Dataset.ofRows`, which is
  * `private[sql]`. The engine's `node_ct` statement hint needs to
  * rebuild a DataFrame from a transformed logical plan (per-relation
  * scan options injected); this is the supported-by-convention way
  * Spark extension libraries reach that factory. No behavior lives
  * here — it only re-exposes the one factory method.
  */
object PlanDataFrame {
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
