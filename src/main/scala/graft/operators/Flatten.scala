package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StructType}

/** Recursive flatten of nested (struct/array) schemas — the reference's
  * signature transform (SURVEY §2.4 F1-F3; cf.
  * `bp-scala-api-ingestions/dataSource bp/ModuleFunctions.scala:211-246`
  * and its per-pipeline variants).
  *
  * One implementation with naming-strategy knobs instead of the
  * reference's three divergent copies:
  * - struct fields expand to `parent<sep>field` aliases in a single
  *   `select` (pure projection — no shuffle, stays in whole-stage
  *   codegen);
  * - arrays explode with `explode_outer` (null/empty arrays keep the
  *   parent row, matching the reference's explode_outer choice);
  * - sibling arrays at the same level are zipped (`arrays_zip`) and
  *   exploded ONCE — the cross-join-free correlated flatten the
  *   reference approximates with monotonically_increasing_id self-joins
  *   (`Rushmore Reviews/ModuleFunctions.scala:437-509`).
  */
object Flatten {

  /** Names that need backtick-quoting when referenced by path. */
  private def q(name: String): String = s"`${name.replace("`", "``")}`"

  /** Fully flatten: no ArrayType/StructType columns remain. */
  def flatten(df: DataFrame, sep: String = "_", stripPrefix: Boolean = false): DataFrame = {
    var cur = df
    var done = false
    while (!done) {
      val fields = cur.schema.fields
      val structs = fields.filter(_.dataType.isInstanceOf[StructType])
      val arrays = fields.filter(_.dataType.isInstanceOf[ArrayType])
      if (structs.nonEmpty) {
        val cols: Seq[Column] = fields.toSeq.flatMap { f =>
          f.dataType match {
            case st: StructType =>
              st.fields.toSeq.map { sf =>
                val alias = if (stripPrefix) sf.name else s"${f.name}$sep${sf.name}"
                col(s"${q(f.name)}.${q(sf.name)}").as(alias)
              }
            case _ => Seq(col(q(f.name)))
          }
        }
        cur = cur.select(cols: _*)
      } else if (arrays.nonEmpty) {
        cur = explodeCorrelated(cur, arrays.map(_.name).toSeq, sep)
      } else done = true
    }
    cur
  }

  /** Post-flatten rename rules — the reference applies a DIFFERENT
    * column-naming convention per target table after flattening
    * (`Rushmore Reviews/ModuleFunctions.scala:223-236`: well_cpr/dpr
    * strip the literal `Data_` prefix and coerce to string; time_depth
    * strips every parent segment). Here they're composable functions
    * over the flattened name instead of three divergent copies. */
  object Rename {
    /** Strip one literal prefix if present ("removes Data_ only"). */
    def stripPrefix(prefix: String): String => String =
      n => if (n.startsWith(prefix)) n.drop(prefix.length) else n

    /** Keep only the leaf segment ("removes ALL parents"). */
    def stripAllParents(sep: String = "_"): String => String =
      n => n.lastIndexOf(sep) match {
        case -1 => n
        case i => n.substring(i + sep.length)
      }

    /** Strip up to and including the first separator (first parent). */
    def stripFirstParent(sep: String = "_"): String => String =
      n => n.indexOf(sep) match {
        case -1 => n
        case i => n.substring(i + sep.length)
      }
  }

  /** Per-table flatten: fully flatten, then apply the table's rename
    * rule (and optional all-to-string coercion, which the reference
    * pairs with the rename for union-compatibility). Unknown tables
    * keep the default `parent<sep>field` names. Renames must stay
    * collision-free — a rule that merges two columns is a config
    * error and fails fast rather than silently dropping data. */
  def flattenFor(df: DataFrame, table: String,
                 rules: Map[String, String => String],
                 toStringTables: Set[String] = Set.empty,
                 sep: String = "_"): DataFrame = {
    val flat = flatten(df, sep)
    val rule = rules.getOrElse(table, identity[String] _)
    val renamed = flat.columns.map(rule).toIndexedSeq
    require(renamed.distinct.length == renamed.length,
      s"rename rule for table $table collides: ${renamed.mkString(",")}")
    val out = flat.toDF(renamed: _*)
    if (toStringTables.contains(table)) SchemaOps.allToString(out) else out
  }

  /** Explode one or more sibling array columns in lock-step (by
    * position), keeping rows with null/empty arrays. A single
    * generator, not N correlated self-joins. */
  def explodeCorrelated(df: DataFrame, arrayCols: Seq[String], sep: String = "_"): DataFrame = {
    require(arrayCols.nonEmpty, "need at least one array column")
    val others = df.columns.filterNot(arrayCols.contains).map(c => col(q(c))).toSeq
    if (arrayCols.sizeIs == 1) {
      val a = arrayCols.head
      df.select(others :+ explode_outer(col(q(a))).as(a): _*)
    } else {
      // arrays_zip pads shorter arrays with null — same row multiplicity
      // as the reference's id-join correlation, minus the join.
      val zc = Spread.freshCol(df, "__z")
      val zipped = df.select(
        others :+ explode_outer(arrays_zip(arrayCols.map(c => col(q(c))): _*)).as(zc): _*)
      zipped.select(others ++ arrayCols.map(a => col(s"$zc.${q(a)}").as(a)): _*)
    }
  }

  /** Positional explode — exposes the element index (F2's correlation
    * key) explicitly instead of monotonically_increasing_id. */
  def posExplode(df: DataFrame, arrayCol: String, posName: String = "pos"): DataFrame = {
    val others = df.columns.filterNot(_ == arrayCol).map(c => col(q(c))).toSeq
    df.select(others :+ posexplode_outer(col(q(arrayCol))): _*)
      .withColumnRenamed("pos", posName)
      .withColumnRenamed("col", arrayCol)
  }
}
