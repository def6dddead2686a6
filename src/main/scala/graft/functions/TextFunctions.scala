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

  /** Distinct word k-shingles; texts shorter than k words collapse to
    * one whole-text shingle. */
  def shingles(text: Column, k: Int): Column = {
    val w = words(text)
    when(size(w) < k, array(concat_ws(" ", w)))
      .otherwise(array_distinct(transform(
        sequence(lit(0), size(w) - k),
        i => concat_ws(" ", slice(w, i + 1, lit(k))))))
  }

  /** Distinct character k-grams of whitespace-normalized lowercase text. */
  def charNgrams(text: Column, k: Int): Column = {
    val t = regexp_replace(lower(text), "\\s+", " ")
    when(length(t) < k, array(t))
      .otherwise(array_distinct(transform(
        sequence(lit(1), length(t) - (k - 1)),
        i => t.substr(i, lit(k)))))
  }

  /** MinHash signature: array of `n` minima over seeded hashes of the
    * shingle set. Seed folded into the hashed string, so any engine
    * with md5 reproduces the family. */
  def minHashSignature(shinglesCol: Column, n: Int): Column =
    transform(sequence(lit(0), lit(n - 1)),
      j => array_min(transform(shinglesCol,
        s => hash64(concat(s, lit("#"), j.cast("string"))))))

  /** Jaccard similarity of two string arrays treated as sets. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(array_union(a, b)).cast("double")
    when(uni === 0, lit(1.0)).otherwise(inter / uni)
  }

  /** Number of SimHash bits (kept under 63 so the value stays a
    * positive BIGINT in every engine). */
  val SimhashBits = 60

  /** SimHash over the word multiset: bit j is set iff the sum of ±1
    * votes (sign of bit j of each word's hash64) is positive. One md5
    * per word; the 60 bit-folds run over the cached hash array. */
  def simhash(text: Column): Column = {
    val h = transform(words(text), w => hash64(w))
    val bits: Seq[Column] = (0 until SimhashBits).map { j =>
      val vote = aggregate(h, lit(0L), (a, x) =>
        a + when(shiftright(x, j).bitwiseAND(lit(1L)) === 1L, lit(1L))
          .otherwise(lit(-1L)))
      when(vote > 0, lit(1L << j)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

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

  /** Ratio of tokens that are stopwords. */
  def stopwordRatio(text: Column): Column = {
    val w = words(text)
    when(size(w) === 0, lit(0.0)).otherwise(
      size(filter(w, x => x.isin(stopwords.map(lit(_)): _*))).cast("double")
        / size(w))
  }

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

  /** Stopword-hit count for one language. */
  def langScore(text: Column, lang: String): Column = {
    val w = words(text)
    size(filter(w, x => x.isin(langStopwords(lang).map(lit(_)): _*)))
  }

  /** Predicted language: argmax stopword hits; ties → alphabetically
    * first language code (deterministic). */
  def langId(text: Column): Column = {
    val langs = langStopwords.keys.toSeq.sorted
    val arr = array(langs.map(l =>
      struct(langScore(text, l).as("score"), lit(l).as("lang"))): _*)
    val maxScore = array_max(transform(arr, _.getField("score")))
    array_min(transform(filter(arr, _.getField("score") === maxScore),
      _.getField("lang")))
  }

  /** Rolling-hash document fingerprint: minimum hash64 over character
    * 8-grams (winnowing-style min-sampling, deterministic). */
  def fingerprint(text: Column, k: Int = 8): Column = {
    val t = regexp_replace(lower(text), "\\s+", " ")
    array_min(transform(
      sequence(lit(1), greatest(length(t) - (k - 1), lit(1))),
      i => hash64(t.substr(i, lit(k)))))
  }
}
