package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-trained bigram language model → per-document negative
  * log-likelihood: the CCNet-style perplexity filter of an LLM data
  * pipeline (train a small LM, keep the low-perplexity head / flag the
  * high-perplexity tail), self-trained here so the whole signal is a
  * pure function of the corpus. [[LmCoverage]] counts how much of a
  * document recurs elsewhere; this scores how PROBABLE the document is
  * under the corpus-wide bigram distribution — the two ends of the
  * same curation axis (boilerplate vs gibberish).
  *
  * Model: add-one-smoothed bigram conditional
  * `P(c | p) = (n(p,c) + 1) / (n(p,·) + V)` with `V` the corpus
  * unigram-type count and `n(p,·)` the count of `p` as a bigram
  * context. Every document's NLL is the occurrence-weighted sum of
  * `-ln P` over its bigrams.
  *
  * Hash-exact across engines: each bigram's `-ln P` is rounded to
  * MICRO-NATS (`round(ln(...) * 1e6)` → long) BEFORE the per-document
  * sum, so the aggregate is an order-free integer sum — a float NLL
  * sum would drift with Spark's reduction order and never hash-match a
  * serial engine. (Same trick as the jaccard-micro pattern in
  * q_dedup_ngram.)
  *
  * Scale shape: ONE tokenize+explode pass over text; the per-document
  * bigram aggregation (map-side combined, keyed (id, p, c)); corpus
  * bigram and context totals attached via two window sums over that
  * SAME grouped frame (no self-join, no second pass over text —
  * [[LmCoverage]]'s shape); the vocabulary size is a one-row broadcast
  * cross join. No corpus-sized broadcast, no all-pairs anything.
  * At 100 TB the (p, c)-keyed shuffle is the cost, and it is the
  * minimal one: any bigram LM must co-locate equal bigrams once.
  */
object NgramLm {

  /** Per-document bigram NLL under the corpus-trained add-one bigram
    * model: (id, n_bigrams, nll_micro) where `nll_micro` is the sum of
    * per-bigram `-ln P` in integer micro-nats and `n_bigrams` counts
    * bigram occurrences. Documents with fewer than two words report
    * zeros (their NLL is an empty product). Perplexity, if a caller
    * wants it, is `exp(nll_micro / 1e6 / n_bigrams)` — kept out of the
    * output to stay float-free. */
  def bigramNll(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = graft.operators.Spread.ensure(
      df.select(col(idCol).as("id"), TextFunctions.words(col(textCol)).as("w")))
    // one row per bigram OCCURRENCE, prev/cur as separate columns (the
    // context count below groups on prev alone). The <2-words guard is
    // the empty-array explode branch: no Filter node on the scan.
    val bg = base.select(col("id"), explode(expr(
      "CASE WHEN size(w) >= 2 THEN transform(sequence(0, size(w) - 2), " +
        "i -> struct(element_at(w, i + 1) AS p, element_at(w, i + 2) AS c)) " +
        "ELSE array() END")).as("b"))
      .select(col("id"), col("b.p").as("p"), col("b.c").as("c"))
    val perDoc = bg.groupBy(col("id"), col("p"), col("c"))
      .agg(count(lit(1)).as("occ"))
    // corpus totals from the grouped frame itself — two window sums,
    // zero extra passes over text
    val withCounts = perDoc
      .withColumn("big_cnt", sum(col("occ")).over(Window.partitionBy(col("p"), col("c"))))
      .withColumn("ctx_cnt", sum(col("occ")).over(Window.partitionBy(col("p"))))
    // vocabulary size: distinct unigram types (two-stage distinct agg).
    // explode_OUTER on purpose: a plain explode of the attribute `w`
    // makes InferFiltersFromGenerate push `size(words(text)) > 0`
    // down to the parquet scan as an unpushable full-regex filter
    // (evaluating words() twice per row); outer generates skip the
    // inference, and countDistinct ignores the null row an empty doc
    // contributes.
    val v = base.select(explode_outer(col("w")).as("t"))
      .agg(countDistinct(col("t")).as("V"))
    val scored = withCounts.crossJoin(broadcast(v))
      .withColumn("mn",
        round(log((col("ctx_cnt") + col("V")).cast("double") /
          (col("big_cnt") + lit(1.0))) * lit(1000000.0)).cast("long"))
    val agg = scored.groupBy(col("id")).agg(
      sum(col("occ")).as("n_bigrams"),
      sum(col("occ") * col("mn")).as("nll_micro"))
    df.select(col(idCol).as("id")).join(agg, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("nll_micro"), lit(0L)).as("nll_micro"))
  }

  /** A trained bigram LM as three frames: bigram counts `bg`
    * (p, c, big_cnt), context counts `ctx` (p, ctx_cnt), and the
    * one-row vocabulary size `v` (V). [[bigramNll]] fuses training
    * and scoring over ONE corpus (window sums, no join); this split
    * exists for scoring OTHER data — arriving batches, a held-out
    * split — against a fixed reference LM. */
  final case class BigramLm(bg: DataFrame, ctx: DataFrame, v: DataFrame)

  /** Train the add-one bigram LM on `corpus`: one tokenize+explode
    * pass, one (p, c) groupBy (map-side combined), context counts
    * re-aggregated from the bigram table (types, not occurrences). */
  def trainBigramLm(corpus: DataFrame, textCol: String): BigramLm = {
    val base = graft.operators.Spread.ensure(
      corpus.select(TextFunctions.words(col(textCol)).as("w")))
    val bg = base.select(explode(expr(
      "CASE WHEN size(w) >= 2 THEN transform(sequence(0, size(w) - 2), " +
        "i -> struct(element_at(w, i + 1) AS p, element_at(w, i + 2) AS c)) " +
        "ELSE array() END")).as("b"))
      .groupBy(col("b.p").as("p"), col("b.c").as("c"))
      .agg(count(lit(1)).as("big_cnt"))
    val ctx = bg.groupBy(col("p")).agg(sum(col("big_cnt")).as("ctx_cnt"))
    val v = base.select(explode_outer(col("w")).as("t")) // see bigramNll
      .agg(countDistinct(col("t")).as("V"))
    BigramLm(bg, ctx, v)
  }

  /** Score `docs` against a FIXED reference [[BigramLm]] (the
    * streaming / held-out phrasing of [[bigramNll]] — identical
    * output when `docs` IS the training corpus). Unseen bigrams and
    * contexts coalesce to zero counts, so an out-of-vocabulary bigram
    * costs `-ln(1/(ctx + V))` with the add-one mass it deserves.
    * Two equi-joins on the (p, c) / p keys — the minimal co-location
    * any scorer needs; the 1-row V broadcasts. */
  def scoreAgainstLm(docs: DataFrame, idCol: String, textCol: String,
                     lm: BigramLm): DataFrame = {
    val base = graft.operators.Spread.ensure(
      docs.select(col(idCol).as("id"), TextFunctions.words(col(textCol)).as("w")))
    val perDoc = base.select(col("id"), explode(expr(
      "CASE WHEN size(w) >= 2 THEN transform(sequence(0, size(w) - 2), " +
        "i -> struct(element_at(w, i + 1) AS p, element_at(w, i + 2) AS c)) " +
        "ELSE array() END")).as("b"))
      .select(col("id"), col("b.p").as("p"), col("b.c").as("c"))
      .groupBy(col("id"), col("p"), col("c"))
      .agg(count(lit(1)).as("occ"))
    val scored = perDoc
      .join(lm.bg, Seq("p", "c"), "left")
      .join(lm.ctx, Seq("p"), "left")
      .crossJoin(broadcast(lm.v))
      .withColumn("mn",
        round(log((coalesce(col("ctx_cnt"), lit(0L)) + col("V")).cast("double") /
          (coalesce(col("big_cnt"), lit(0L)) + lit(1.0))) * lit(1000000.0))
          .cast("long"))
    val agg = scored.groupBy(col("id")).agg(
      sum(col("occ")).as("n_bigrams"),
      sum(col("occ") * col("mn")).as("nll_micro"))
    docs.select(col(idCol).as("id")).join(agg, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("nll_micro"), lit(0L)).as("nll_micro"))
  }
}
