package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Integer-exact BM25 full-text retrieval.
  *
  * Classic BM25 is float arithmetic (ln-idf, fractional length
  * normalization), whose reduction order never hash-matches across
  * engines. This variant keeps the ranking shape of BM25 but computes
  * it entirely in 64-bit integers so any engine reproduces it bit-for-
  * bit:
  *
  *  - idf2(t)   = bitlen(N div df_t)  — the floor-log2 analogue of
  *                ln(N/df); `bitlen(n) = length(bin(n))` is identical
  *                in Spark and DuckDB (`bin(5) = "101"`).
  *  - tfPart    = (tf·(k1+1000)·1000) div
  *                (tf·1000 + k1·(1000 − b + (b·dl·N) div L))
  *                with the Robertson parameters k1, b scaled per-mille
  *                (k1 = 1200 ⇒ 1.2, b = 750 ⇒ 0.75); dl = doc length,
  *                L = Σ dl, so (dl·N) div L is dl/avgdl per-mille-free.
  *  - score     = Σ_t idf2·tfPart  (BIGINT; ties broken by doc id).
  *
  * Scale shape (the part that matters at 100 TB): the corpus-wide
  * token pass is the index build — one shuffle keyed by (doc, term)
  * for tf, one by doc for dl. Query terms are DISTINCT-ed and
  * BROADCAST so the postings restriction `tokens ⋈ query-terms` is a
  * map-side filter (never a shuffle of the corpus by query), and df is
  * computed only for candidate terms. Global stats (N, L) ride along
  * as a broadcast single row. No driver collects, no cross products.
  *
  * Reference analogue: keyword/document relevance ranking in the
  * curation pipelines (the reference scores documents driver-side;
  * here it is one declarative plan).
  */
object Bm25 {

  /** Per-(query, doc) BM25 scores for the top `k` docs per query.
    *
    * @param docs    corpus with `idCol` (numeric id) and `textCol`
    * @param queries frame with `qidCol` and `qtextCol` (query text is
    *                tokenized with the same analyzer as documents)
    * @return columns (query_id, doc_id, score, rank)
    */
  def topK(docs: DataFrame, idCol: String, textCol: String,
           queries: DataFrame, qidCol: String, qtextCol: String,
           k: Int, k1pm: Int = 1200, bpm: Int = 750): DataFrame =
    topKFromTokens(
      docs.select(col(idCol).as("doc_id"),
        explode(TextFunctions.words(col(textCol))).as("term")),
      queries, qidCol, qtextCol, k, k1pm, bpm)

  /** [[topK]] over a pre-tokenized (doc_id, term) stream — lets a
    * hybrid pipeline tokenize the corpus ONCE and feed several
    * retrievers (the token frame is the shared index scan). */
  def topKFromTokens(tokens: DataFrame,
                     queries: DataFrame, qidCol: String, qtextCol: String,
                     k: Int, k1pm: Int = 1200, bpm: Int = 750): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(k1pm >= 0 && bpm >= 0 && bpm <= 1000,
      s"per-mille params out of range: k1pm=$k1pm bpm=$bpm")

    // index-build side: doc lengths and corpus totals (one agg each)
    val dlen = tokens.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("dl"))
    val global = dlen.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("total_len"))

    // query side: distinct terms, broadcast into the postings filter
    val qterms = queries
      .select(col(qidCol).as("query_id"),
        explode(TextFunctions.words(col(qtextCol))).as("term"))
      .distinct()
    val candTerms = qterms.select(col("term")).distinct()

    val tf = tokens
      .join(broadcast(candTerms), Seq("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term"))
      .agg(count(lit(1)).as("df"))

    val scored = tf
      .join(broadcast(dfreq), Seq("term"))
      .join(dlen, Seq("doc_id"))
      .crossJoin(broadcast(global))
      .join(broadcast(qterms), Seq("term"))
      .withColumn("idf2", length(bin(expr("n_docs div df"))))
      .withColumn("tf_part",
        expr(s"(tf * ${k1pm + 1000L} * 1000) div " +
          s"(tf * 1000 + $k1pm * (1000 - $bpm + ($bpm * dl * n_docs) div total_len))"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("idf2") * col("tf_part")).cast("long").as("score"))

    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("score"),
        col("rank").cast("int").as("rank"))
  }
}
