package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** Config-string-driven casts and column renaming (SURVEY §2.3 P3/P7/P8).
  *
  * The reference drives these off job-queue metadata strings:
  * `changeColumnSchema` parses `"col:dtype[:newName]"` specs
  * (`dataSource bp/ModuleFunctions.scala:663-686`), renames strip
  * prefixes/spaces (`:248-260`, `Tables.scala:276`), and whole frames
  * get coerced to string before unions
  * (`Rushmore Reviews/ModuleFunctions.scala:227-230`).
  */
object SchemaOps {

  /** One spec: "name:ddlType" or "name:ddlType:newName" or
    * "name:timestamp:newName:fmt" (timestamp with explicit format, as
    * `PSS WHI (XML)/ModuleFunctions.scala:464-470`). */
  def castBySpec(df: DataFrame, specs: Seq[String]): DataFrame = {
    val bySrc = specs.map { s =>
      // limit 4: the 4th part is a timestamp format and may contain ':'
      val p = s.split(":", 4)
      require(p.length >= 2, s"bad cast spec: $s")
      val (name, ddl) = (p(0), p(1))
      val newName = if (p.length >= 3 && p(2).nonEmpty) p(2) else name
      val c =
        if (ddl.equalsIgnoreCase("timestamp") && p.length >= 4)
          to_timestamp(col(s"`$name`"), p(3))
        else col(s"`$name`").cast(DataType.fromDDL(ddl))
      name -> c.as(newName)
    }.toMap
    df.select(df.columns.toSeq.map(c => bySrc.getOrElse(c, col(s"`$c`"))): _*)
  }

  /** All columns → string (pre-union coercion, P8). */
  def allToString(df: DataFrame): DataFrame =
    df.select(df.columns.toSeq.map(c => col(s"`$c`").cast("string").as(c)): _*)

  /** Normalize names: trim, spaces/dashes → underscore, optional
    * prefix strip then prefix add. */
  def normalizeNames(df: DataFrame, stripPrefix: String = "", addPrefix: String = ""): DataFrame = {
    val renamed = df.columns.map { c =>
      var n = c.trim.replaceAll("[ \\-]+", "_")
      if (stripPrefix.nonEmpty && n.startsWith(stripPrefix)) n = n.substring(stripPrefix.length)
      addPrefix + n
    }
    df.toDF(renamed.toIndexedSeq: _*)
  }

  /** Align `df` to `target` column set for a safe unionByName: missing
    * columns added as typed nulls, extras dropped (schema-drift
    * tolerance, SURVEY §1.3). */
  def alignTo(df: DataFrame, target: StructType): DataFrame = {
    val have = df.columns.toSet
    val cols: Seq[Column] = target.fields.toSeq.map { f =>
      if (have.contains(f.name)) col(s"`${f.name}`").cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }
    df.select(cols: _*)
  }
}
