package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact phrase search over a document corpus via a positional
  * inverted index — the equi-join formulation, not a regex scan.
  *
  * A phrase of length L occurs at position p iff every (term_i, i)
  * of the phrase matches a (token, p+i) of the document. Joining the
  * positional token stream with the broadcast phrase terms on the
  * term and grouping by the ALIGNED START `p − i` turns phrase
  * matching into: count(distinct phrase offsets) == L. One shuffle
  * keyed by (doc, phrase, start); the phrase table is broadcast.
  *
  * Versus `text LIKE '%…%'`: the regex scan re-reads every byte for
  * every phrase; the positional join tokenizes once, matches all
  * phrases in one pass, and — with the token stream persisted as an
  * index table — amortizes across query batches. (Tokens here are
  * the analyzer's words, so matching is case/punctuation-insensitive
  * — different semantics from a byte-level LIKE, and the semantics a
  * search engine wants.)
  */
object Phrase {

  /** Count exact occurrences of each phrase in each document.
    * Returns (doc_id, phrase, n_matches, first_pos) for documents
    * with ≥1 match; `first_pos` is the 0-based token offset. */
  def phraseMatches(docs: DataFrame, idCol: String, textCol: String,
                    phrases: Seq[String]): DataFrame = {
    require(phrases.nonEmpty, "need at least one phrase")
    val spark = docs.sparkSession
    import spark.implicits._

    val phraseTerms = phrases
      .flatMap { p =>
        val terms = p.toLowerCase.split("\\s+").filter(_.nonEmpty)
        require(terms.nonEmpty, s"phrase tokenizes to nothing: '$p'")
        terms.zipWithIndex.map { case (t, i) => (p, i, t, terms.length) }
      }
      .toDF("phrase", "offset", "term", "phrase_len")

    val tokens = docs.select(col(idCol).as("doc_id"),
      posexplode(TextFunctions.words(col(textCol)))
        .as(Seq("pos", "term")))

    tokens
      .join(broadcast(phraseTerms), Seq("term"))
      .select(col("doc_id"), col("phrase"), col("phrase_len"),
        (col("pos") - col("offset")).as("start"), col("offset"))
      .where(col("start") >= 0)
      // one row per matched (start, offset); a full phrase needs all
      // L offsets present at the same start
      .groupBy(col("doc_id"), col("phrase"), col("phrase_len"),
        col("start"))
      .agg(count(lit(1)).as("n_offsets"))
      .where(col("n_offsets") === col("phrase_len"))
      .groupBy(col("doc_id"), col("phrase"))
      .agg(count(lit(1)).cast("long").as("n_matches"),
        min(col("start")).cast("long").as("first_pos"))
  }
}
