package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into `private[sql]` surface: building a DataFrame from a custom
  * LogicalPlan (`Dataset.ofRows`) has no public API, and graft's as-of-join
  * operator (graft.plans.AsOfJoin) needs exactly that. Lives in the
  * `org.apache.spark.sql` package solely for access; no Spark internals are
  * modified.
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
