package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank fusion for hybrid retrieval (lexical + vector/fuzzy).
  *
  * Reciprocal-rank fusion (Cormack et al., SIGIR'09): each retriever
  * contributes `1/(rrfK + rank)` per (query, doc); docs missing from a
  * retriever's top-k contribute nothing. The division is computed as
  * `1_000_000_000 div (rrfK + rank)` so the fused score is a BIGINT —
  * bit-identical in any engine — instead of a float sum whose
  * reduction order wobbles.
  *
  * Scale shape: each input ranking is already top-k-per-query (tiny
  * relative to the corpus); the fusion is a union + one groupBy keyed
  * by (query, doc) + one per-query window — no corpus-sized shuffle.
  */
object Fusion {

  /** Fuse rankings (each with columns query_id, doc_id, rank) into a
    * top-`k` list per query. Returns (query_id, doc_id, rrf_score,
    * rank) with ties broken by doc_id. */
  def reciprocalRankFusion(rankings: Seq[DataFrame], k: Int,
                           rrfK: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    require(k > 0 && rrfK >= 0, s"bad params k=$k rrfK=$rrfK")
    val unioned = rankings
      .map(_.select(col("query_id"), col("doc_id"), col("rank")))
      .reduce(_.unionByName(_))
    val fused = unioned
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(expr(s"1000000000 div ($rrfK + rank)")).cast("long")
        .as("rrf_score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_score").desc, col("doc_id"))
    fused.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("rrf_score"),
        col("rank").cast("int").as("rank"))
  }

  /** Word-set Jaccard retriever: integer-ppm Jaccard between each
    * query's distinct word set and each document's, computed as a
    * broadcast equi-join on the term (docs that share no term are
    * never materialized — no cross product). Returns top-`k` per
    * query as (query_id, doc_id, jaccard_ppm, rank). */
  def jaccardTopK(docs: DataFrame, idCol: String, textCol: String,
                  queries: DataFrame, qidCol: String, qtextCol: String,
                  k: Int): DataFrame =
    jaccardTopKFromTokens(
      docs.select(col(idCol).as("doc_id"),
        explode(TextFunctions.words(col(textCol))).as("term")),
      queries, qidCol, qtextCol, k)

  /** [[jaccardTopK]] over a pre-tokenized (doc_id, term) stream —
    * shares one tokenize pass with other retrievers in a hybrid
    * pipeline. */
  def jaccardTopKFromTokens(tokens: DataFrame,
                            queries: DataFrame, qidCol: String,
                            qtextCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val docTerms = tokens.distinct()
    val docSizes = docTerms.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_doc_terms"))
    val qTerms = queries
      .select(col(qidCol).as("query_id"),
        explode(TextFunctions.words(col(qtextCol))).as("term"))
      .distinct()
    val qSizes = qTerms.groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_q_terms"))
    val inter = docTerms
      .join(broadcast(qTerms), Seq("term"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).as("inter"))
    val scored = inter
      .join(docSizes, Seq("doc_id"))
      .join(broadcast(qSizes), Seq("query_id"))
      .withColumn("jaccard_ppm",
        expr("(inter * 1000000) div (n_q_terms + n_doc_terms - inter)"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("jaccard_ppm").desc, col("doc_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("jaccard_ppm"),
        col("rank").cast("int").as("rank"))
  }
}
