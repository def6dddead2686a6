package graft.operators

import graft.{SparkEntry, SparkSpec}
import graft.plans.{PlanLint, PlanLintAllowlist}

/** Plan-hygiene gate over the ENTIRE query surface: lints every
  * `SparkEntry.queries` physical plan and fails on any (query, rule)
  * pair not in the reviewed allowlist. A new operator that introduces
  * a cartesian product, an unconditioned nested-loop join, a
  * single-partition exchange, or an unpushed scan filter breaks the
  * build instead of surfacing in a later bench audit.
  *
  * The allowlist lives in main ([[PlanLintAllowlist]]) because
  * `graft.Bench` enforces the SAME list during the driver's bench run
  * (fail-fast after pass 1) — a plan regression is caught even in a
  * round where tests are skipped. This spec additionally reports a
  * pair that STOPS firing as stale (assert, not ignore) so the list
  * shrinks as plans improve instead of rotting.
  */
class PlanLintSweepSpec extends SparkSpec {

  private val allowed = PlanLintAllowlist.allowed

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
