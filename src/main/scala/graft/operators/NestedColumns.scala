package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StructType}

/** Nested-column drop (SURVEY §2.3 P6). The reference hand-rolls a
  * recursive struct rebuild plus an `arrays_zip` workaround for
  * SPARK-31779 (`dataSource bp/ModuleFunctions.scala:281-374`, 94 LoC).
  * On Spark 3.1+ `Column.dropFields` + `transform` subsume all of it.
  */
object NestedColumns {

  /** Drop a dot-separated nested path, e.g. "meta.geo.lat".
    * Handles struct-in-struct and array-of-struct at any level. */
  def dropNested(df: DataFrame, path: String): DataFrame = {
    val parts = path.split('.')
    require(parts.length >= 1, s"bad path: $path")
    if (parts.length == 1) df.drop(parts.head)
    else {
      val top = parts.head
      df.schema.find(_.name == top) match {
        case None => df
        case Some(f) =>
          df.withColumn(top, dropIn(col(top), f.dataType, parts.tail.toList))
      }
    }
  }

  private def dropIn(c: Column, dt: org.apache.spark.sql.types.DataType,
                     rest: List[String]): Column = dt match {
    case st: StructType =>
      rest match {
        case leaf :: Nil => c.dropFields(leaf)
        case head :: tail =>
          st.find(_.name == head) match {
            case Some(f) => c.withField(head, dropIn(c.getField(head), f.dataType, tail))
            case None => c
          }
        case Nil => c
      }
    case ArrayType(elem, _) =>
      // array-of-struct: rebuild each element (SPARK-31779 territory)
      transform(c, x => dropIn(x, elem, rest))
    case _ => c
  }

  /** Drop several nested paths. */
  def dropAll(df: DataFrame, paths: Seq[String]): DataFrame =
    paths.foldLeft(df)(dropNested)
}
