package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.operators.Spread

/** Corpus-statistics keyword extraction: per-document top-k terms by
  * TF-IDF (smoothed: tf · (ln((N+1)/(df+1)) + 1)).
  *
  * Scale design: one tokenize+explode pass produces (doc, term) rows;
  * term frequency and document frequency are both groupBy aggregations
  * with map-side partial combine (shuffle keys (doc, term) and term
  * respectively), the idf join is a plain equi-join on term, and the
  * top-k is a per-document window — every stage is shuffle-keyed on a
  * high-cardinality column, so nothing concentrates at 1000×  the
  * data. The corpus size N is a single scalar count (one job, no
  * collect of row data).
  */
object Keywords {

  /** Top-k TF-IDF terms per document:
    * (id, term, tf, df_docs, score, rank), rank 1..k. */
  def tfidfTopK(df: DataFrame, idCol: String, textCol: String,
                k: Int): DataFrame = {
    val n = df.count() // corpus size: scalar driver value, one job
    val base = Spread.ensure(df.select(col(idCol).as("id"),
        col(textCol).as("txt")))
      .select(col("id"), words(col("txt")).as("w"))
    // explode_outer sidesteps InferFiltersFromGenerate's inlined
    // generator filter (see SpanDedup); empty docs drop out here
    val toks = base.select(col("id"), explode_outer(col("w")).as("term"))
      .where(col("term").isNotNull)
    val perDoc = toks.groupBy(col("id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    // perDoc already has one row per (doc, term), so document
    // frequency is a plain count per term
    val docFreq = perDoc.groupBy(col("term"))
      .agg(count(lit(1)).as("df_docs"))
    val scored = perDoc.join(docFreq, Seq("term"))
      .withColumn("score",
        round(col("tf") * (log((lit(n) + lit(1.0)) /
          (col("df_docs") + lit(1.0))) + lit(1.0)), 6))
    val byScore = Window.partitionBy(col("id"))
      .orderBy(col("score").desc, col("term"))
    scored.withColumn("rank", row_number().over(byScore))
      .where(col("rank") <= k)
      .select(col("id"), col("term"), col("tf"), col("df_docs"),
        col("score"), col("rank"))
  }
}
