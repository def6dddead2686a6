package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The one standard seam every third-party Spark plan library needs: a
  * `DataFrame` can only be built from a raw `LogicalPlan` via
  * `Dataset.ofRows`, which is `private[sql]`, so this object lives
  * under `org.apache.spark.sql` to re-expose exactly that (the same
  * technique used by open-source Spark extensions such as Delta and
  * Sedona). Nothing else from the private surface is exported, and no
  * graft engine logic lives here.
  */
object Bridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
