package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into the sql-private DataFrame constructor, so graft can
  * expose a custom `FileIndex`-backed relation (the checkpoint-served
  * store reader) as a plain DataFrame — the same extension seam
  * Delta-class table formats build their snapshot readers on. */
object GraftRelationBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
