package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` crossing the custom-operator path needs: turning a
  * hand-built [[LogicalPlan]] back into a public DataFrame. Spark exposes
  * every other piece of the whole-operator extension surface publicly
  * (`SparkSessionExtensions.injectPlannerStrategy`, `SparkStrategy`,
  * `SparkPlan`, `experimental.extraStrategies`) but keeps plan→Dataset
  * construction session-internal, so libraries adding operators place this
  * shim in the sql package — the established pattern across open-source
  * Spark extensions. Kept to the single call; everything else in
  * [[graft.plans]] uses public/DeveloperApi surfaces. */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
