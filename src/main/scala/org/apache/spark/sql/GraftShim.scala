package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Accessor for building a DataFrame from a custom LogicalPlan — the
  * classic Dataset companion is private[sql], so operator libraries
  * (graft.plans.AsOfJoin) reach `ofRows` through this one-line shim,
  * the standard pattern for third-party Catalyst operator packages. */
object GraftShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
