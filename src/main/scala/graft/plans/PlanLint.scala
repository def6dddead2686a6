package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.catalyst.plans.physical.SinglePartition

/** Static plan audit: the scale-hygiene rules this repo applies by
  * hand (PlanSpec's pushdown/broadcast/no-cartesian asserts), packaged
  * as a reusable lint a pipeline can run on any query before
  * submitting it at 100-TB scale. Each finding names the physical node
  * and why it will hurt on a large cluster.
  *
  * Rules:
  *  - `cartesian-product`: CartesianProductExec — O(|L|·|R|) row
  *    products never survive a scale-up.
  *  - `unconditioned-nested-loop`: BroadcastNestedLoopJoin with no
  *    join condition — a cross product in disguise (condition-bearing
  *    BNL joins, e.g. intentional broadcast range probes, pass).
  *  - `single-partition-exchange`: an Exchange to ONE partition
  *    serializes everything through one task. Legitimate for
  *    known-tiny results (`Spread.smallSort` does it on purpose) —
  *    the finding is a prompt to confirm the result is tiny.
  *  - `scan-without-pushed-filters`: a parquet scan with data filters
  *    in the plan but nothing pushed to the reader — the filter runs
  *    AFTER full-row materialization (typical cause: wrapping the
  *    column in an expression before comparing).
  *
  * Works on the pre-AQE physical plan (`sparkPlan`): lints are
  * static-shape checks, and AQE's runtime re-plans only ever remove
  * (never add) the flagged shapes.
  */
object PlanLint {

  final case class Finding(rule: String, node: String, detail: String)

  def lint(df: DataFrame): Seq[Finding] =
    lintPlan(df.queryExecution.sparkPlan)

  def lintPlan(plan: SparkPlan): Seq[Finding] = {
    val findings = Seq.newBuilder[Finding]
    plan.foreach {
      case j: CartesianProductExec =>
        findings += Finding("cartesian-product", j.nodeName,
          "row-product join; restructure to an equi-join or broadcast")
      case j: BroadcastNestedLoopJoinExec if j.condition.isEmpty =>
        findings += Finding("unconditioned-nested-loop", j.nodeName,
          s"${j.joinType} BNL join with no condition — cross product")
      case e: ShuffleExchangeExec
          if e.outputPartitioning == SinglePartition =>
        findings += Finding("single-partition-exchange", e.nodeName,
          "all rows funnel through one task; confirm the input is tiny")
      case s: FileSourceScanExec
          if nonTrivial(s.dataFilters.map(_.toString)).nonEmpty &&
            nonTrivial(pushed(s)).isEmpty =>
        findings += Finding("scan-without-pushed-filters", s.nodeName,
          s"filters ${s.dataFilters.mkString(", ")} evaluate after the " +
            "scan; none (beyond null checks) reached the parquet reader")
      case _ => ()
    }
    findings.result()
  }

  private def pushed(s: FileSourceScanExec): Seq[String] =
    s.metadata.get("PushedFilters").toSeq
      .flatMap(_.stripPrefix("[").stripSuffix("]").split(",").map(_.trim))
      .filter(_.nonEmpty)

  /** Null checks are pushed for free alongside any filter; only
    * value-bearing predicates count as real pushdown. */
  private def nonTrivial(filters: Seq[String]): Seq[String] =
    filters.filterNot(f => f.toLowerCase.startsWith("isnotnull") ||
      f.toLowerCase.startsWith("isnull"))

  /** Convenience gate: throw if any rule in `failOn` fires. */
  def enforce(df: DataFrame, failOn: Set[String] = Set(
      "cartesian-product", "unconditioned-nested-loop")): Unit = {
    val bad = lint(df).filter(f => failOn.contains(f.rule))
    require(bad.isEmpty,
      "plan lint failed:\n" + bad.map(f => s"  [${f.rule}] ${f.detail}")
        .mkString("\n"))
  }

  /** Findings recorded by an installed listener: (queryName-or-empty,
    * finding). */
  final case class Observed(funcName: String, finding: Finding)

  /** Install a QueryExecutionListener that lints EVERY successful query
    * the session executes and accumulates findings — the production
    * form of [[lint]]: plan hygiene becomes telemetry instead of a
    * code-review habit. Returns the live (thread-safe) findings
    * buffer; `buffer.clear()` between pipeline stages scopes reports.
    * Listener callbacks run on the listener bus thread and never block
    * or fail the query. */
  def install(spark: org.apache.spark.sql.SparkSession
             ): java.util.concurrent.ConcurrentLinkedQueue[Observed] = {
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[Observed]()
    spark.listenerManager.register(
      new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
                               qe: org.apache.spark.sql.execution.QueryExecution,
                               durationNs: Long): Unit = {
          try lintPlan(qe.sparkPlan)
            .foreach(f => buf.add(Observed(funcName, f)))
          catch { case _: Throwable => () } // telemetry must not throw
        }
        override def onFailure(funcName: String,
                               qe: org.apache.spark.sql.execution.QueryExecution,
                               exception: Exception): Unit = ()
      })
    buf
  }

  /** Fraction of physical operators inside whole-stage-codegen spans —
    * a quick hot-path health metric (interpreted expressions and UDFs
    * break spans). Uses the executed plan, where codegen collapsing
    * has happened. */
  def codegenCoverage(df: DataFrame): Double = {
    var inSpan = 0
    var total = 0
    def walk(p: SparkPlan, inside: Boolean): Unit = {
      val name = p.getClass.getSimpleName
      val nowInside = inside || name.startsWith("WholeStageCodegen")
      if (!name.startsWith("WholeStageCodegen") &&
        !name.startsWith("InputAdapter")) {
        total += 1
        if (nowInside) inSpan += 1
      }
      p.children.foreach(walk(_, nowInside))
    }
    // Under AQE codegen collapses per-stage at MATERIALIZATION, so a
    // not-yet-run adaptive plan contains no codegen spans at all.
    // Re-plan the same logical plan with AQE off — codegen collapsing
    // then happens statically and the spans are inspectable without
    // executing anything. (Session-conf toggle: not safe concurrently
    // with other planning on the same session; this is a diagnostic.)
    val session = df.sparkSession
    val key = "spark.sql.adaptive.enabled"
    val prev = session.conf.get(key)
    session.conf.set(key, "false")
    try walk(session.sessionState.executePlan(df.queryExecution.logical)
      .executedPlan, inside = false)
    finally session.conf.set(key, prev)
    if (total == 0) 1.0 else inSpan.toDouble / total
  }
}
