package graft.operators

import graft.{SparkEntry, SparkSpec}
import graft.plans.PlanLint

/** Plan-hygiene gate over the ENTIRE query surface: lints every
  * `SparkEntry.queries` physical plan and fails on any (query, rule)
  * pair not in the reviewed allowlist below. A new operator that
  * introduces a cartesian product, an unconditioned nested-loop join,
  * a single-partition exchange, or an unpushed scan filter breaks the
  * build instead of surfacing in a later bench audit.
  *
  * The allowlist is every finding as of round 6, each reviewed:
  *  - `single-partition-exchange` — intentional `Spread.smallSort`
  *    final orderings of known-tiny results (pair lists, reports).
  *  - `unconditioned-nested-loop` — cross joins against broadcast
  *    sub-row frames (k-means centroid sets, 1-row aggregates); the
  *    "nested loop" is k× or 1× per row, not |L|·|R|.
  *  - `scan-without-pushed-filters` — predicates parquet can never
  *    push: modulo fixtures (`id % 17 = 0`), deterministic md5-bucket
  *    sampling, array-size guards. Nothing pushable is being missed
  *    (q_mixture's CASE-chain WAS missable and is fixed in
  *    `Sampling.mixtureResample` rather than listed here).
  *
  * A pair that STOPS firing is reported as stale (assert, not ignore)
  * so the list shrinks as plans improve instead of rotting.
  */
class PlanLintSweepSpec extends SparkSpec {

  private val allowed: Set[(String, String)] = Set(
    "q_agg_incremental" -> "scan-without-pushed-filters",
    "q_bloom_decontam" -> "single-partition-exchange",
    "q_chunks" -> "scan-without-pushed-filters",
    "q_chunks" -> "single-partition-exchange",
    "q_containment" -> "single-partition-exchange",
    "q_decontam" -> "scan-without-pushed-filters",
    "q_decontam" -> "single-partition-exchange",
    "q_dedup_embed" -> "single-partition-exchange",
    "q_dedup_minhash" -> "single-partition-exchange",
    "q_dedup_ngram" -> "single-partition-exchange",
    "q_dedup_simhash" -> "single-partition-exchange",
    "q_dup_spans" -> "single-partition-exchange",
    "q_kmeans_assign" -> "unconditioned-nested-loop",
    "q_kmeans_update" -> "scan-without-pushed-filters",
    "q_kmeans_update" -> "unconditioned-nested-loop",
    "q_max_spans" -> "single-partition-exchange",
    "q_minhash_incr" -> "single-partition-exchange",
    "q_mixture" -> "single-partition-exchange",
    "q_quality_filter" -> "single-partition-exchange",
    "q_range_join" -> "scan-without-pushed-filters",
    "q_repetition" -> "single-partition-exchange",
    "q_sample_det" -> "scan-without-pushed-filters",
    "q_sample_strat" -> "scan-without-pushed-filters",
    "q_scd2" -> "scan-without-pushed-filters",
    "q_scd2" -> "single-partition-exchange",
    "q_sem_decontam" -> "single-partition-exchange",
    "q_semdedup" -> "single-partition-exchange",
    "q_semdedup" -> "unconditioned-nested-loop",
    "q_seq_pack" -> "single-partition-exchange",
    "q_snapshot_diff" -> "scan-without-pushed-filters",
    "q_snapshot_diff" -> "single-partition-exchange",
    "q_tfidf" -> "single-partition-exchange",
    "q_union_evolve" -> "scan-without-pushed-filters",
    "q_upsert" -> "scan-without-pushed-filters",
    "q_zorder" -> "scan-without-pushed-filters",
    "q_zorder" -> "single-partition-exchange")

  test("no query plan has an unreviewed lint finding") {
    val observed = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val pairs =
          try PlanLint.lint(fn(spark, sf)).map(f => name -> f.rule).distinct
          catch {
            case e: Throwable =>
              fail(s"$name failed to plan: ${e.getMessage}", e)
          }
        spark.catalog.clearCache() // queries may persist shared subtrees
        pairs
    }.toSet

    val unreviewed = observed -- allowed
    assert(unreviewed.isEmpty,
      s"\nNEW plan-lint findings (fix the plan or review into the " +
        s"allowlist):\n  ${unreviewed.toSeq.sorted.mkString("\n  ")}")

    val stale = allowed -- observed
    assert(stale.isEmpty,
      s"\nstale allowlist entries (plans improved — remove them):\n  " +
        stale.toSeq.sorted.mkString("\n  "))
  }
}
