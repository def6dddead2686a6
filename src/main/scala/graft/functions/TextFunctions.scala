package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale training-data
  * pipelines: tokenization, shingling, deterministic 64-bit hashing,
  * MinHash signatures, SimHash, quality scoring, language-ID scoring,
  * and rolling fingerprints.
  *
  * Everything here is a pure Catalyst `Column` expression built from
  * codegen'd builtins — no UDFs, no driver round-trips — so plans stay
  * inside WholeStageCodegen and scale linearly with executors.
  *
  * Hashing is md5-derived (`hash64`) rather than Spark's xxhash64 so
  * results are reproducible in any engine with md5 (the DuckDB oracle
  * mirrors every function here 1:1).
  */
object TextFunctions {

  /** Deterministic 60-bit positive hash: first 15 hex chars of md5. */
  def hash64(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Lowercased alphanumeric word tokens; empty text → empty array. */
  def words(text: Column): Column = {
    val cleaned = trim(lower(regexp_replace(text, "[^a-zA-Z0-9 ]", " ")))
    when(length(cleaned) === 0, array().cast("array<string>"))
      .otherwise(split(cleaned, "\\s+"))
  }

  /** Word token count. */
  def tokenCount(text: Column): Column = size(words(text))

  /** BPE-ish subword count: alnum runs and punctuation marks each
    * count as one token (regex split, no external tokenizer). */
  def subwordCount(text: Column): Column =
    size(filter(split(regexp_replace(text, "([^a-zA-Z0-9\\s])", " $1 "),
      "\\s+"), x => length(x) > 0))

  /** CRITICAL lambda-cost rule: an expression referenced inside a
    * higher-order-function lambda body is RE-EVALUATED once per array
    * element — `transform(seq, i => f(words(text), i))` runs the whole
    * words() regex per position per row. The `*From*` variants below
    * therefore take a pre-materialized (attribute) column; the
    * one-expression conveniences are only safe where the outer value
    * is already an attribute or the array is tiny. */

  /** Distinct word k-shingles from a materialized words array. */
  def shinglesFromWords(w: Column, k: Int): Column =
    when(size(w) < k, array(concat_ws(" ", w)))
      .otherwise(array_distinct(transform(
        sequence(lit(0), size(w) - k),
        i => concat_ws(" ", slice(w, i + 1, lit(k))))))

  /** Convenience one-expression shingles (slow path: see lambda-cost
    * rule — materialize `words` first in hot paths). */
  def shingles(text: Column, k: Int): Column =
    shinglesFromWords(words(text), k)

  /** Whitespace-collapsed lowercase text (the normalization step for
    * char n-grams and fingerprints). */
  def normalized(text: Column): Column =
    regexp_replace(lower(text), "\\s+", " ")

  /** Distinct character k-grams from a materialized normalized-text
    * column. */
  def charNgramsFromNormalized(t: Column, k: Int): Column =
    when(length(t) < k, array(t))
      .otherwise(array_distinct(transform(
        sequence(lit(1), length(t) - (k - 1)),
        i => t.substr(i, lit(k)))))

  /** Convenience one-expression char k-grams (slow path in hot loops). */
  def charNgrams(text: Column, k: Int): Column =
    charNgramsFromNormalized(normalized(text), k)

  /** Universal-hash family for MinHash: g_j(h) = (a_j*(h mod P) + b_j)
    * mod P with P prime < 2^30, so products stay < 2^51 — no overflow
    * in any engine (DuckDB BIGINT overflow is an error, Spark wraps;
    * staying small sidesteps both). One md5 per shingle total, then n
    * cheap arithmetic re-hashes — 32× less md5 than hashing
    * (shingle, seed) pairs. */
  val MinHashP = 1073741789L // largest prime below 2^30
  /** Large mixing constants — small multipliers (2j+3 etc.) leave the
    * permutations near-monotone and the per-j minima correlated, which
    * wrecks both LSH recall and band selectivity. a*h stays < 2^60. */
  def minHashCoeff(j: Int): (Long, Long) = {
    val a = (2654435761L * (j + 1)) % MinHashP
    val b = (1779033703L * (j + 13)) % MinHashP
    (if (a == 0) 1L else a, b)
  }

  /** Base hashes for MinHash: one md5 per shingle. Materialize this as
    * a real column (own projection) before calling
    * `minHashSignatureFromHashes` — higher-order functions are
    * interpreted (no codegen, no common-subexpression elimination), so
    * inlining this under the n per-j minima recomputes every md5 n
    * times. */
  def minHashBaseHashes(shinglesCol: Column): Column =
    transform(shinglesCol, s => hash64(s) % MinHashP)

  /** MinHash signature from pre-materialized base hashes: array of `n`
    * minima of g_j, each a cheap arithmetic pass. */
  def minHashSignatureFromHashes(baseHashes: Column, n: Int): Column =
    array((0 until n).map { j =>
      val (a, b) = minHashCoeff(j)
      array_min(transform(baseHashes, h => (h * a + b) % MinHashP))
    }: _*)

  /** One-expression MinHash signature (convenience; prefer the
    * two-step materialized form in hot paths). */
  def minHashSignature(shinglesCol: Column, n: Int): Column =
    minHashSignatureFromHashes(minHashBaseHashes(shinglesCol), n)

  /** Jaccard similarity of two string arrays treated as sets. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(array_union(a, b)).cast("double")
    when(uni === 0, lit(1.0)).otherwise(inter / uni)
  }

  /** Number of SimHash bits (kept under 63 so the value stays a
    * positive BIGINT in every engine). */
  val SimhashBits = 60

  /** Word-hash array feeding simhash: one md5 per word. Materialize as
    * a real column before `simhashFromHashes` (same interpreted-HOF
    * reasoning as `minHashBaseHashes` — inlined, the md5 pass would run
    * once per bit fold). */
  def wordHashes(text: Column): Column =
    transform(words(text), w => hash64(w))

  /** SimHash from pre-materialized word hashes: bit j is set iff the
    * sum of ±1 votes (sign of bit j of each hash) is positive. */
  def simhashFromHashes(h: Column): Column = {
    val bits: Seq[Column] = (0 until SimhashBits).map { j =>
      val vote = aggregate(h, lit(0L), (a, x) =>
        a + when(shiftright(x, j).bitwiseAND(lit(1L)) === 1L, lit(1L))
          .otherwise(lit(-1L)))
      when(vote > 0, lit(1L << j)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** One-expression SimHash (convenience; prefer the two-step
    * materialized form in hot paths). */
  def simhash(text: Column): Column = simhashFromHashes(wordHashes(text))

  /** Hamming distance between two simhash values. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Punctuation character ratio. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0)).otherwise(
      (length(text) - length(regexp_replace(text, "[\\p{Punct}]", "")))
        .cast("double") / length(text))

  /** English stopword list used by stopwordRatio/qualityScore. */
  val stopwords: Seq[String] = Seq("the", "a", "an", "and", "or", "of",
    "to", "in", "is", "on", "for", "with", "as", "by", "at", "it")

  /** Ratio of tokens that are stopwords, from a materialized words
    * array. */
  def stopwordRatioFromWords(w: Column): Column =
    when(size(w) === 0, lit(0.0)).otherwise(
      size(filter(w, x => x.isin(stopwords.map(lit(_)): _*))).cast("double")
        / size(w))

  /** Ratio of tokens that are stopwords. */
  def stopwordRatio(text: Column): Column =
    stopwordRatioFromWords(words(text))

  /** Composite quality score in [0,1]: length, punctuation sanity,
    * stopword presence (heuristic in the C4/Gopher filter family). */
  def qualityScore(text: Column): Column = {
    val lenScore = least(tokenCount(text).cast("double") / 100.0, lit(1.0))
    val punctOk = when(punctRatio(text) < 0.2, 1.0).otherwise(0.0)
    val stopOk = when(stopwordRatio(text) > 0.01, 1.0).otherwise(0.5)
    round(lenScore * 0.5 + punctOk * 0.25 + stopOk * 0.25, 4)
  }

  /** Per-language stopword profiles for the n-gram/stopword langid
    * heuristic. */
  val langStopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "es" -> Seq("el", "la", "de", "que", "es"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "zh" -> Seq("de", "shi", "zai", "he", "bu"))

  /** Stopword-hit count for one language, from a materialized words
    * array. */
  def langScoreFromWords(w: Column, lang: String): Column =
    size(filter(w, x => x.isin(langStopwords(lang).map(lit(_)): _*)))

  /** Stopword-hit count for one language. */
  def langScore(text: Column, lang: String): Column =
    langScoreFromWords(words(text), lang)

  /** Predicted language from a materialized words array: argmax
    * stopword hits; ties → alphabetically first language code
    * (deterministic). */
  def langIdFromWords(w: Column): Column = {
    val langs = langStopwords.keys.toSeq.sorted
    val arr = array(langs.map(l =>
      struct(langScoreFromWords(w, l).as("score"), lit(l).as("lang"))): _*)
    val maxScore = array_max(transform(arr, _.getField("score")))
    array_min(transform(filter(arr, _.getField("score") === maxScore),
      _.getField("lang")))
  }

  /** Predicted language (convenience; materialize `words` in hot
    * paths). */
  def langId(text: Column): Column = langIdFromWords(words(text))

  /** Rolling-hash fingerprint from a materialized normalized-text
    * column: minimum hash64 over character 8-grams (winnowing-style
    * min-sampling, deterministic). */
  def fingerprintFromNormalized(t: Column, k: Int = 8): Column =
    array_min(transform(
      sequence(lit(1), greatest(length(t) - (k - 1), lit(1))),
      i => hash64(t.substr(i, lit(k)))))

  /** Rolling-hash document fingerprint (convenience). */
  def fingerprint(text: Column, k: Int = 8): Column =
    fingerprintFromNormalized(normalized(text), k)

  // --- PII redaction (training-data hygiene) -----------------------------
  // Patterns restricted to constructs with identical semantics in
  // java.util.regex (Spark codegen) and RE2 (DuckDB oracle): character
  // classes, bounded repetition — no lookaround, no backrefs.
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlRe = "https?://[^\\s]+"
  val PhoneRe = "\\+?[0-9][0-9()\\-. ]{6,}[0-9]"

  /** Replace emails/URLs/phone-shaped spans with typed placeholder
    * tokens — chained codegen'd regexp_replace, one projection, no
    * UDF. Order matters: URLs first (they may contain '@' and digit
    * runs that the other patterns would mangle). */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, UrlRe, "<URL>"),
        EmailRe, "<EMAIL>"),
      PhoneRe, "<PHONE>")
}
