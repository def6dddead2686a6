package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.operators.Spread

/** Benchmark decontamination for training corpora: find (and drop)
  * training documents that overlap an evaluation/benchmark set at the
  * word-n-gram level — the standard guard against test-set leakage
  * when assembling LLM training data.
  *
  * Scale shape: the corpus is the 100-TB side; the benchmark is small
  * by construction (eval suites are thousands of documents). Benchmark
  * grams are therefore distinct-collapsed and BROADCAST, so the
  * corpus-side probe is a map-side hash lookup inside one scan — no
  * shuffle of corpus text at all until the tiny per-doc count
  * aggregation. Grams travel as 60-bit md5 hashes (8 bytes), never as
  * strings.
  */
object Decontaminate {

  /** (id, g) distinct word-k-shingle hashes, one row per gram.
    *
    * explode_OUTER on purpose, and not for null-padding: a plain
    * `explode` triggers the InferFiltersFromGenerate optimizer rule,
    * which synthesizes `size(child) > 0 AND isnotnull(child)` and
    * pushes it below the spread Exchange — with the whole
    * words+shingles pipeline INLINED into the predicate (twice), the
    * shingle lambda re-evaluating words() per position, all on the
    * single scan partition. Measured at sf0.1: 19 s of filter vs 4.7 s
    * for the whole stage with the rule sidestepped. The rule skips
    * outer generators, and `sh` is never empty (short texts fall back
    * to one whole-text shingle), so OUTER changes semantics only for
    * null text, which yields a null gram that no benchmark gram ever
    * equals. */
  private def gramRows(df: DataFrame, idCol: String, textCol: String,
                       k: Int): DataFrame =
    Spread.ensure(df.select(col(idCol).as("id"), col(textCol).as("txt")))
      .select(col("id"), words(col("txt")).as("w"))
      .select(col("id"), shinglesFromWords(col("w"), k).as("sh"))
      .select(col("id"), explode_outer(col("sh")).as("s"))
      .select(col("id"), hash64(col("s")).as("g"))

  /** Per-document contamination: of the doc's distinct k-shingles, how
    * many appear in ANY benchmark document. Returns
    * (id, n_grams, n_hit, contamination), docs with n_hit > 0.
    * `broadcastBench=false` falls back to a shuffle join for the rare
    * huge-benchmark case. */
  def contaminationScores(docs: DataFrame, bench: DataFrame,
                          idCol: String, textCol: String,
                          benchTextCol: String, k: Int = 5,
                          broadcastBench: Boolean = true): DataFrame = {
    val dg = gramRows(docs, idCol, textCol, k)
    // benchmark id is irrelevant for the score; collapse to the gram set
    val bg0 = gramRows(bench.select(monotonically_increasing_id().as("bid"),
      col(benchTextCol)), "bid", benchTextCol, k)
      .select(col("g")).distinct()
      .withColumn("hit", lit(1))
    val bg = if (broadcastBench) broadcast(bg0) else bg0
    dg.join(bg, Seq("g"), "left")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("hit"), lit(0))).as("n_hit"))
      .where(col("n_hit") > 0)
      .select(col("id"), col("n_grams"), col("n_hit"),
        round(col("n_hit").cast("double") / col("n_grams"), 6)
          .as("contamination"))
  }

  /** `contaminationScores` for the case where the benchmark gram set
    * is too LARGE to broadcast exactly (a full eval-suite union can
    * reach hundreds of millions of grams). A Bloom filter of the
    * benchmark grams is ~10 bits/gram at 1% fpp — broadcastable long
    * after the exact set is not — and prunes corpus grams map-side, so
    * only the candidates that might hit (true hits + fpp noise) enter
    * the exact shuffle join. The corpus text itself still never
    * shuffles. The RESULT IS EXACT for any fpp: the bloom only admits
    * false positives, and the exact join then rejects them — fpp
    * trades shuffle volume, not correctness (same oracle as
    * `contaminationScores`).
    *
    * The probe is a Scala UDF over the broadcast sketch — Spark has
    * no public might_contain expression — which breaks codegen for
    * that one filter; the probe is a few xxhash evaluations per gram
    * and buys the elimination of the corpus-side shuffle, which
    * dominates at scale. */
  def contaminationScoresBloom(docs: DataFrame, bench: DataFrame,
                               idCol: String, textCol: String,
                               benchTextCol: String, k: Int = 5,
                               fpp: Double = 0.01): DataFrame = {
    val spark = docs.sparkSession
    val bg = gramRows(bench.select(monotonically_increasing_id().as("bid"),
      col(benchTextCol)), "bid", benchTextCol, k)
      .select(col("g")).distinct().persist()
    val nBench = math.max(bg.count(), 64L) // sizes the filter; one action
    val filter = bg.stat.bloomFilter("g", nBench, fpp)
    val bcast = spark.sparkContext.broadcast(filter)
    val mightContain = udf((g: Long) => bcast.value.mightContainLong(g))
    val dg = gramRows(docs, idCol, textCol, k).persist()
    val hits = dg.where(mightContain(col("g")))
      .join(bg, Seq("g"), "left_semi") // exact verify kills fpp noise
      .groupBy(col("id")).agg(count(lit(1)).as("n_hit"))
    val out = dg.groupBy(col("id")).agg(count(lit(1)).as("n_grams"))
      .join(hits, Seq("id")) // inner: only contaminated docs survive
      .select(col("id"), col("n_grams"), col("n_hit"),
        round(col("n_hit").cast("double") / col("n_grams"), 6)
          .as("contamination"))
      // Cache lifecycle: bg and dg are gram-scale (O(corpus tokens)) and
      // must not outlive this call in a long session. Materialize the
      // doc-scale result (contaminated docs only — orders of magnitude
      // smaller), then release the gram caches eagerly. The returned
      // frame stays cached; callers may unpersist() it when done.
      .persist()
    out.count()
    bg.unpersist(blocking = false)
    dg.unpersist(blocking = false)
    out
  }

  /** Pair-level attribution: which benchmark doc each training doc
    * overlaps, and by how many distinct grams. Returns
    * (id, bench_id, n_shared) with n_shared >= minShared. */
  def contaminationPairs(docs: DataFrame, bench: DataFrame,
                         idCol: String, textCol: String,
                         benchIdCol: String, benchTextCol: String,
                         k: Int = 5, minShared: Long = 1,
                         broadcastBench: Boolean = true): DataFrame = {
    val dg = gramRows(docs, idCol, textCol, k)
    val bg0 = gramRows(bench, benchIdCol, benchTextCol, k)
      .select(col("id").as("bench_id"), col("g")).distinct()
    val bg = if (broadcastBench) broadcast(bg0) else bg0
    dg.join(bg, Seq("g"))
      .groupBy(col("id"), col("bench_id"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }

  /** Embedding-space (semantic) contamination: corpus documents whose
    * vector lies within cosine ≥ `threshold` of ANY benchmark vector —
    * catches paraphrased/translated benchmark leakage that n-gram
    * overlap misses (the gram-based checks above are blind to
    * rewording). Returns every (id, bench_id, cosine) hit.
    *
    * Scale shape: the benchmark side is small by construction, so it
    * BROADCASTS and the probe is a nested-loop over one corpus scan —
    * no shuffle of corpus vectors. The per-pair kernel is the codegen'd
    * Cosine expression, not a UDF. For benchmark sets too large to
    * broadcast, cluster both sides first and probe per cell
    * (`Dedup.embeddingNearDupPairs` shape). */
  def semanticContamination(corpus: DataFrame, bench: DataFrame,
                            idCol: String, vecCol: String,
                            benchIdCol: String, benchVecCol: String,
                            threshold: Double): DataFrame = {
    graft.expressions.GraftFunctions.register(corpus.sparkSession)
    val c = Spread.ensure(corpus.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v")))
    val b = broadcast(bench.select(col(benchIdCol).as("bench_id"),
      col(benchVecCol).cast("array<double>").as("bv")))
    c.crossJoin(b)
      .select(col("id"), col("bench_id"),
        round(call_function(graft.expressions.GraftFunctions.Cosine,
          col("v"), col("bv")), 6).as("cosine"))
      .where(col("cosine") >= threshold)
  }

  /** The corpus minus documents flagged by [[semanticContamination]]. */
  def semanticDecontaminate(corpus: DataFrame, bench: DataFrame,
                            idCol: String, vecCol: String,
                            benchIdCol: String, benchVecCol: String,
                            threshold: Double): DataFrame = {
    val bad = semanticContamination(corpus, bench, idCol, vecCol,
      benchIdCol, benchVecCol, threshold)
      .select(col("id").as(idCol)).distinct()
    corpus.join(bad, Seq(idCol), "left_anti")
  }

  /** The corpus minus documents whose contamination exceeds
    * `maxContamination` (fraction of distinct grams found in the
    * benchmark set). */
  def decontaminate(docs: DataFrame, bench: DataFrame, idCol: String,
                    textCol: String, benchTextCol: String, k: Int = 5,
                    maxContamination: Double = 0.1): DataFrame = {
    val bad = contaminationScores(docs, bench, idCol, textCol,
      benchTextCol, k)
      .where(col("contamination") > maxContamination)
      .select(col("id").as(idCol))
    docs.join(bad, Seq(idCol), "left_anti")
  }
}
