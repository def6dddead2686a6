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

  /** Per-document NLL under a Jelinek-Mercer INTERPOLATED bigram
    * model — the estimator a real CCNet-style perplexity gate uses
    * instead of add-one (add-one drowns frequent contexts in
    * vocabulary mass; interpolation backs a sparse bigram off to the
    * unigram distribution instead):
    *
    * `P(c | p) = λ · n(p,c)/n(p,·) + (1−λ) · (n(c)+1)/(N+V)`
    *
    * with λ given in ppm (0.9 = 900000), `n(c)` the unigram occurrence
    * count, `N` total tokens and `V` unigram types — the add-one
    * unigram backstop keeps every token priced (an unseen-at-scoring
    * token would otherwise cost infinity; within-corpus it also prices
    * hapax continuations sanely). Same micro-nat discipline as
    * [[bigramNll]]: each bigram's `-ln P` rounds to an integer BEFORE
    * the per-document sum, so hashes are engine-independent.
    *
    * Scale shape = [[bigramNll]] plus ONE equi-join of the per-doc
    * bigram aggregate against the (token, count) unigram table on the
    * continuation key — co-located, map-side combined, no extra pass
    * over text; (N, V) is a one-row broadcast. */
  def interpolatedNll(df: DataFrame, idCol: String, textCol: String,
                      lambdaPpm: Long = 900000L): DataFrame = {
    require(lambdaPpm >= 0 && lambdaPpm <= 1000000L,
      s"lambdaPpm must be in [0, 1000000], got $lambdaPpm")
    val base = graft.operators.Spread.ensure(
      df.select(col(idCol).as("id"), TextFunctions.words(col(textCol)).as("w")))
    val bg = base.select(col("id"), explode(expr(bigramsExpr)).as("b"))
      .select(col("id"), col("b.p").as("p"), col("b.c").as("c"))
    val perDoc = bg.groupBy(col("id"), col("p"), col("c"))
      .agg(count(lit(1)).as("occ"))
    val withCounts = perDoc
      .withColumn("big_cnt", sum(col("occ")).over(Window.partitionBy(col("p"), col("c"))))
      .withColumn("ctx_cnt", sum(col("occ")).over(Window.partitionBy(col("p"))))
    // unigram table + corpus totals from the same tokenize pass
    // (explode_outer: see bigramNll's scan-pushdown note)
    val toks = base.select(explode_outer(col("w")).as("t"))
    val uni = toks.where(col("t").isNotNull)
      .groupBy(col("t").as("c")).agg(count(lit(1)).as("uni_cnt"))
    val totals = toks.agg(
      count(col("t")).as("n_tok"), countDistinct(col("t")).as("V"))
    val scored = withCounts
      .join(uni, Seq("c"))
      .crossJoin(broadcast(totals))
      .withColumn("mn", round(-log(
        (lit(lambdaPpm.toDouble) *
          (col("big_cnt").cast("double") / col("ctx_cnt")) +
          lit((1000000L - lambdaPpm).toDouble) *
            ((col("uni_cnt") + lit(1L)).cast("double") /
              (col("n_tok") + col("V")))) / lit(1000000.0))
        * lit(1000000.0)).cast("long"))
    val agg = scored.groupBy(col("id")).agg(
      sum(col("occ")).as("n_bigrams"),
      sum(col("occ") * col("mn")).as("nll_micro"))
    df.select(col(idCol).as("id")).join(agg, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("nll_micro"), lit(0L)).as("nll_micro"))
  }

  /** Per-document NLL under an interpolated KNESER–NEY bigram model —
    * the tokenizer/LM family's production smoother (Kneser & Ney 1995;
    * Chen & Goodman 1998's interpolated form), completing the
    * estimator ladder add-one → Jelinek-Mercer → KN. Where JM backs a
    * sparse bigram off to the unigram FREQUENCY, KN backs off to the
    * CONTINUATION probability — how many distinct contexts a word
    * follows — which is what stops high-frequency-but-fixed collocates
    * ("Francisco", seen almost only after "San") from being priced as
    * cheap continuations everywhere:
    *
    * `P(c | p) = max(n(p,c) − D, 0)/n(p,·)
    *             + (D/n(p,·)) · N1+(p,·) · N1+(·,c)/N1+(·,·)`
    *
    * with D the absolute discount in ppm (750000 = 0.75, the
    * Chen–Goodman-recommended region), N1+(p,·)/N1+(·,c) the distinct
    * continuation/context type counts and N1+(·,·) the total bigram
    * type count. Self-trained scoring means every scored bigram
    * exists in the corpus, so N1+(·,c) ≥ 1 and P > 0 always. Same
    * micro-nat discipline as [[bigramNll]]: each bigram's `-ln P`
    * rounds to an integer BEFORE the per-document sum — the double
    * formula is mirrored operand-for-operand by the oracle.
    *
    * Scale shape: [[bigramNll]]'s tokenize+explode pass and
    * (id, p, c) partial-agg, plus one (p, c) type-level aggregate
    * (distinct-type statistics cannot ride a window sum over the
    * per-doc frame) and three co-located equi-joins back onto the
    * per-doc rows (keys p, c, (p,c) — the type tables are vocabulary-
    * sized); N1+(·,·) is a one-row broadcast. */
  def kneserNeyNll(df: DataFrame, idCol: String, textCol: String,
                   discountPpm: Long = 750000L): DataFrame = {
    require(discountPpm > 0 && discountPpm < 1000000L,
      s"discountPpm must be in (0, 1000000), got $discountPpm")
    val d = discountPpm.toDouble / 1000000.0
    val base = graft.operators.Spread.ensure(
      df.select(col(idCol).as("id"), TextFunctions.words(col(textCol)).as("w")))
    val bg = base.select(col("id"), explode(expr(bigramsExpr)).as("b"))
      .select(col("id"), col("b.p").as("p"), col("b.c").as("c"))
    val perDoc = bg.groupBy(col("id"), col("p"), col("c"))
      .agg(count(lit(1)).as("occ"))
    // corpus bigram TYPE table: counts for the discounted ML term,
    // row counts per p / per c for the continuation statistics
    val types = perDoc.groupBy(col("p"), col("c"))
      .agg(sum(col("occ")).as("big_cnt"))
    val fwd = types.groupBy(col("p"))
      .agg(count(lit(1)).as("n1_fwd"), sum(col("big_cnt")).as("ctx_cnt"))
    val bwd = types.groupBy(col("c")).agg(count(lit(1)).as("n1_bwd"))
    val tot = types.agg(count(lit(1)).as("tot_types"))
    val scored = perDoc
      .join(types, Seq("p", "c"))
      .join(fwd, Seq("p"))
      .join(bwd, Seq("c"))
      .crossJoin(broadcast(tot))
      .withColumn("mn", round(-log(
        (greatest(col("big_cnt").cast("double") - lit(d), lit(0.0)) +
          (lit(d) * col("n1_fwd")) *
            (col("n1_bwd").cast("double") / col("tot_types"))) /
          col("ctx_cnt")) * lit(1000000.0)).cast("long"))
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

  private val bigramsExpr: String =
    "CASE WHEN size(w) >= 2 THEN transform(sequence(0, size(w) - 2), " +
      "i -> struct(element_at(w, i + 1) AS p, element_at(w, i + 2) AS c)) " +
      "ELSE array() END"

  /** D×D cross-domain LM matrix: one INTERPOLATED bigram LM per
    * domain (source, language, …) — the [[interpolatedNll]] estimator,
    * which matters far more here than within-corpus: a foreign
    * domain's text is full of bigrams the training domain never saw,
    * and add-one prices them all at the same vocabulary-mass floor
    * while interpolation separates "unseen bigram, common word"
    * (cheap: unigram backstop) from "unseen word entirely" (the true
    * add-one floor). Every domain's text is scored under every
    * domain's LM — the measurement behind domain-reweighting schemes
    * (DoReMi-style mixture tuning): the diagonal is each domain's
    * self-fit, the off-diagonal says how well domain t's distribution
    * explains domain e.
    *
    * Returns (train_domain, eval_domain, n_docs, n_bigrams,
    * nll_micro) — `n_docs` counts eval-domain documents, `nll_micro`
    * is the occurrence-weighted sum of per-bigram `-ln P` in integer
    * micro-nats (order-free; same hash-exactness contract as
    * [[bigramNll]]). Mean NLL per bigram is `nll_micro / n_bigrams`.
    *
    * Scale shape: ONE tokenize+explode pass; per-domain train counts
    * are (dom, p, c) / (dom, p) aggregations of that pass (map-side
    * combined); the eval side re-aggregates the same bigrams at
    * (dom, p, c) and fans out ×D via a broadcast of the tiny domain
    * list — total work is D× the corpus bigram types, the inherent
    * cost of a D×D matrix, all equi-join co-located. The interpolation
    * adds one equi-join against the per-domain unigram table on the
    * (domain, continuation) key; per-domain (N, V) totals are a D-row
    * broadcast. No per-domain loop, no driver-side anything. */
  def crossDomainNll(df: DataFrame, domainCol: String,
                     textCol: String,
                     lambdaPpm: Long = 900000L): DataFrame = {
    require(lambdaPpm >= 0 && lambdaPpm <= 1000000L,
      s"lambdaPpm must be in [0, 1000000], got $lambdaPpm")
    val base = graft.operators.Spread.ensure(
      df.select(col(domainCol).as("dom"), TextFunctions.words(col(textCol)).as("w")))
    val bg = base.select(col("dom"), explode(expr(bigramsExpr)).as("b"))
      .select(col("dom"), col("b.p").as("p"), col("b.c").as("c"))
      .groupBy(col("dom"), col("p"), col("c"))
      .agg(count(lit(1)).as("occ"))
      // both the train-count and eval sides read this one aggregation
      .persist()
    val tc = bg.select(col("dom").as("dom_t"), col("p"), col("c"),
      col("occ").as("big_cnt"))
    val ctx = tc.groupBy(col("dom_t"), col("p"))
      .agg(sum(col("big_cnt")).as("ctx_cnt"))
    // per-domain unigram table + (token total, type count) — from the
    // same tokenize pass (explode_outer: see bigramNll)
    val domTok = base.select(col("dom").as("dom_t"),
      explode_outer(col("w")).as("t"))
    val uni = domTok.where(col("t").isNotNull)
      .groupBy(col("dom_t"), col("t").as("c"))
      .agg(count(lit(1)).as("uni_cnt"))
    val v = domTok.groupBy(col("dom_t"))
      .agg(count(col("t")).as("n_tok"), countDistinct(col("t")).as("V"))
    val nDocs = df.groupBy(col(domainCol).as("dom_e"))
      .agg(count(lit(1)).as("n_docs"))
    val domains = bg.select(col("dom").as("dom_t")).distinct()
    val scored = bg.select(col("dom").as("dom_e"), col("p"), col("c"), col("occ"))
      .crossJoin(broadcast(domains))
      .join(tc, Seq("dom_t", "p", "c"), "left")
      .join(ctx, Seq("dom_t", "p"), "left")
      .join(uni, Seq("dom_t", "c"), "left")
      .join(broadcast(v), Seq("dom_t"))
      // unseen context in domain t ⇒ the ML term is zero mass, not 0/0
      .withColumn("ml", when(col("ctx_cnt").isNull, lit(0.0))
        .otherwise(coalesce(col("big_cnt"), lit(0L)).cast("double") /
          col("ctx_cnt")))
      .withColumn("mn", round(-log(
        (lit(lambdaPpm.toDouble) * col("ml") +
          lit((1000000L - lambdaPpm).toDouble) *
            ((coalesce(col("uni_cnt"), lit(0L)) + lit(1L)).cast("double") /
              (col("n_tok") + col("V")))) / lit(1000000.0))
        * lit(1000000.0)).cast("long"))
    scored.groupBy(col("dom_t"), col("dom_e")).agg(
        sum(col("occ")).as("n_bigrams"),
        sum(col("occ") * col("mn")).as("nll_micro"))
      .join(broadcast(nDocs), Seq("dom_e"))
      .select(col("dom_t").as("train_domain"), col("dom_e").as("eval_domain"),
        col("n_docs"), col("n_bigrams"), col("nll_micro"))
  }

  /** Mixture weights from a [[crossDomainNll]] matrix: a domain whose
    * text NO other domain's LM explains well is unique and gets
    * up-weighted; a domain whose best foreign LM scores it almost as
    * well as its own LM is redundant and floors at zero.
    *
    * For eval domain e, with mean per-bigram NLLs in integer
    * micro-nats (floor division — exact across engines):
    * `margin = max(0, min over t≠e of mean(t,e) − mean(e,e))`, and
    * `weight_ppm = floor(margin · 10⁶ / Σ margins)` (uniform
    * `floor(10⁶ / D)` when every margin is zero — degenerate
    * single-domain or all-identical corpora). Weights are floors, so
    * they sum to ≤ 10⁶; feed them to the budget allocators
    * ([[graft.sample.Budget]]) which own residue semantics.
    *
    * Driver-free: D×D input rows, three tiny aggregations. */
  def domainMixWeights(matrix: DataFrame): DataFrame = {
    val mean = matrix.select(col("train_domain"), col("eval_domain"),
      expr("nll_micro div greatest(n_bigrams, 1)").as("mean_micro"))
    val self = mean.where(col("train_domain") === col("eval_domain"))
      .select(col("eval_domain"), col("mean_micro").as("self_micro"))
    val bestCross = mean.where(col("train_domain") =!= col("eval_domain"))
      .groupBy(col("eval_domain"))
      .agg(min(col("mean_micro")).as("cross_micro"))
    val margins = self.join(bestCross, Seq("eval_domain"), "left")
      .select(col("eval_domain").as("domain"), col("self_micro"),
        coalesce(col("cross_micro"), col("self_micro")).as("cross_micro"),
        greatest(coalesce(col("cross_micro"), col("self_micro")) -
          col("self_micro"), lit(0L)).as("margin_micro"))
    val totals = margins.agg(sum(col("margin_micro")).as("total_margin"),
      count(lit(1)).as("n_domains"))
    margins.crossJoin(broadcast(totals))
      .select(col("domain"), col("self_micro"), col("cross_micro"),
        col("margin_micro"),
        when(col("total_margin") > 0,
          expr("(margin_micro * 1000000) div total_margin"))
          .otherwise(expr("1000000 div n_domains")).as("weight_ppm"))
  }
}
