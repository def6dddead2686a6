package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pivot (long → wide) and unpivot (wide → long) reshaping.
  *
  * The reference reshapes wide/long in pandas on the driver after
  * collecting query results (SharePoint/Power BI post-processing);
  * here both directions stay distributed.
  *
  * Scale notes:
  *   - `pivot` REQUIRES the explicit pivot-value list. Spark's
  *     value-less overload first runs a distinct job over the pivot
  *     column and collects it to the driver — an extra full scan and
  *     a driver-size hazard at 100 TB. With values given, Spark plans
  *     two phases: a partial-aggregated groupBy(group, pivot) sum
  *     (the only shuffle that sees full-size data) followed by a
  *     pivotfirst regroup over the already-reduced distinct pairs.
  *   - `unpivot` uses Spark's native Dataset.unpivot (Expand node):
  *     each input row fans out to N output rows in-place — no
  *     shuffle, no join, columnar scan prunes to id+value columns.
  */
object Reshape {

  /** Wide table: one row per `groupCols`, one `agg(valueCol)` column
    * per entry of `values`, named `prefix_<value>`. */
  def pivotSum(df: DataFrame, groupCols: Seq[String], pivotCol: String,
               values: Seq[String], valueCol: Column,
               prefix: String): DataFrame = {
    val wide = df.groupBy(groupCols.map(col): _*)
      .pivot(pivotCol, values)
      .agg(sum(valueCol))
    values.foldLeft(wide)((d, v) => d.withColumnRenamed(v, s"${prefix}_$v"))
  }

  /** Long table: (idCols, varName, valName) rows, one per value col. */
  def unpivot(df: DataFrame, idCols: Seq[String], valueCols: Seq[String],
              varName: String, valName: String): DataFrame =
    df.unpivot(idCols.map(col).toArray, valueCols.map(col).toArray,
      varName, valName)
}
