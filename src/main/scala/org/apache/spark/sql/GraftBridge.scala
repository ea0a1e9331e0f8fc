package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{DataFrame => CDataFrame, Dataset, SparkSession => CSparkSession}

/** The one-line bridge every Spark extension library needs: `Dataset.ofRows`
  * is `private[sql]`, so turning a custom [[LogicalPlan]] node (graft.plans)
  * into a public DataFrame requires a helper compiled inside the
  * `org.apache.spark.sql` package — the same pattern Delta/Sedona/Iceberg
  * use. No other private API is touched.
  */
object GraftBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[CSparkSession], plan)
}
