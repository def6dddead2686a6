package graft.classify

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.Converge.SanitizedCheckpoint

/** Classifier evaluation in exact ppm fixed point: per-class
  * precision / recall / F1 from a scored (label, prediction) frame —
  * the quality-classifier audit every labeling pipeline needs next
  * to the model itself (NaiveBayes here, but any scorer's output
  * fits). Float metrics drift under reduction order; ratios of exact
  * confusion-cell counts do not.
  *
  * Scale shape: ONE groupBy over (label, pred) — the confusion
  * matrix, |classes|² cells regardless of corpus size — then scalar
  * arithmetic on the checkpointed cells.
  */
object Evaluation {

  /** Per-class metrics: (clazz, n_true, n_pred, n_correct,
    * precision_ppm, recall_ppm, f1_ppm). Classes are the union of
    * observed labels and predictions; a class never predicted has
    * precision 0, one never true has recall 0 (and F1 0) — explicit
    * zeros, not nulls. */
  def classMetrics(df: DataFrame, label: Column, pred: Column): DataFrame = {
    val cells = df.select(label.as("l"), pred.as("p"))
      .where(col("l").isNotNull && col("p").isNotNull)
      .groupBy(col("l"), col("p")).agg(count(lit(1)).as("c"))
      .sanitizedCheckpoint() // |classes|² cells; everything below is tiny
    val classes = cells.select(col("l").as("clazz"))
      .unionByName(cells.select(col("p").as("clazz"))).distinct()
    val byTrue = cells.groupBy(col("l").as("clazz"))
      .agg(sum(col("c")).as("n_true"))
    val byPred = cells.groupBy(col("p").as("clazz"))
      .agg(sum(col("c")).as("n_pred"))
    val correct = cells.where(col("l") === col("p"))
      .select(col("l").as("clazz"), col("c").as("n_correct"))
    classes
      .join(byTrue, Seq("clazz"), "left")
      .join(byPred, Seq("clazz"), "left")
      .join(correct, Seq("clazz"), "left")
      .na.fill(0L, Seq("n_true", "n_pred", "n_correct"))
      .select(col("clazz"), col("n_true"), col("n_pred"), col("n_correct"),
        expr("case when n_pred = 0 then 0L else " +
          "(1000000 * n_correct) div n_pred end").as("precision_ppm"),
        expr("case when n_true = 0 then 0L else " +
          "(1000000 * n_correct) div n_true end").as("recall_ppm"))
      .withColumn("f1_ppm",
        expr("case when precision_ppm + recall_ppm = 0 then 0L else " +
          "(2 * precision_ppm * recall_ppm) " +
          "div (precision_ppm + recall_ppm) end"))
  }
}
