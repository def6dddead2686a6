package graft.classify

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rule-based file classification (SURVEY §2.11) — the NetApp Step 2
  * exclusion rules (`bp-unstructured-netapp-ingestion/
  * ModuleFunctions.py:375-464`), which the reference evaluates on
  * `collect()`ed rows in the driver. Re-expressed as native Column
  * predicates so classification distributes and stays in codegen —
  * the explicit scalability fix of SURVEY §2.11.
  */
object Classifier {

  /** Exclusion rule set: any hit marks the file excluded, with a
    * reason. Term matching is case-insensitive (the reference joins
    * regex terms with '|' under IGNORECASE). */
  case class Rules(excludedExtensions: Seq[String] = Nil,
                   excludedFolderPrefixes: Seq[String] = Nil,
                   excludedNameTerms: Seq[String] = Nil,
                   excludedPathTerms: Seq[String] = Nil)

  private def rlikeAny(c: Column, terms: Seq[String]): Column =
    if (terms.isEmpty) lit(false)
    else c.rlike("(?i)(" + terms.map(java.util.regex.Pattern.quote).mkString("|") + ")")

  /** Adds `isExcluded` + `exclusionReason` based on path/name/ext
    * columns. Reason precedence: extension, folder, name, path. */
  def classify(df: DataFrame, rules: Rules, pathCol: String = "path",
               nameCol: String = "name", extCol: String = "ext"): DataFrame = {
    val extHit = if (rules.excludedExtensions.isEmpty) lit(false)
      else lower(col(extCol)).isin(rules.excludedExtensions.map(_.toLowerCase): _*)
    val folderHit = if (rules.excludedFolderPrefixes.isEmpty) lit(false)
      else rules.excludedFolderPrefixes
        .map(p => col(pathCol).startsWith(p)).reduce(_ || _)
    val nameHit = rlikeAny(col(nameCol), rules.excludedNameTerms)
    val pathHit = rlikeAny(col(pathCol), rules.excludedPathTerms)
    df.withColumn("exclusionReason",
        when(extHit, "extension").when(folderHit, "folder")
          .when(nameHit, "name").when(pathHit, "path"))
      .withColumn("isExcluded", col("exclusionReason").isNotNull)
  }
}
