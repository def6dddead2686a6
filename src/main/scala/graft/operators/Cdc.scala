package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture application: fold an ordered change log
  * (insert/update/delete operations with a monotonic sequence number,
  * Debezium/Delta-CDF shape) into a base snapshot to produce the
  * current state.
  *
  * Semantics: per key, the highest-sequence change wins; a winning
  * `D` (delete tombstone) removes the row; the base snapshot acts as
  * sequence −∞. Ties on (key, seq) are broken by an explicit op
  * priority `D > U > I` so a same-seq upsert+delete pair resolves to
  * the delete — a well-formed feed is unique-per-(key, seq) and the
  * tiebreak never fires.
  *
  * Scale shape: one shuffle by key (the window), no join back to the
  * base — union + keep-latest is the same plan Delta's CDF apply
  * compiles to, and AQE handles skewed keys. The change log is
  * typically ≪ the snapshot; neither side is ever broadcast because
  * the union needs no join at all.
  *
  * Reference analogue: incremental MERGE ingestion with delete
  * handling (`PSS WHI (XML)/Tables.scala` Delta merge paths) — here
  * as one declarative keep-latest over base ∪ changes.
  */
object Cdc {

  /** Apply `changes` to `snapshot`. Both frames must share the value
    * columns; `changes` additionally carries `seqCol` (numeric,
    * monotone) and `opCol` ('I' | 'U' | 'D'). Returns the final state
    * with the snapshot's columns. */
  def applyChangeLog(snapshot: DataFrame, changes: DataFrame,
                     keys: Seq[String], seqCol: String,
                     opCol: String): DataFrame = {
    require(keys.nonEmpty, "need at least one key column")
    val valueCols = snapshot.columns.toSeq
    val base = snapshot
      .withColumn(seqCol, lit(Long.MinValue))
      .withColumn(opCol, lit("I"))
    val all = base.unionByName(changes.select(
      (valueCols :+ seqCol :+ opCol).map(col): _*))
    val opPriority = when(col(opCol) === "D", 2)
      .when(col(opCol) === "U", 1).otherwise(0)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(seqCol).desc, opPriority.desc)
    all.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1 && col(opCol) =!= "D")
      .select(valueCols.map(col): _*)
  }
}
