package graft.operators

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Observation-based convergence signatures for fixed-point loops.
  *
  * Every signature-converged iteration (SCC's color/mark passes, the
  * dedup star-contraction) used to pay TWO Spark jobs per round: the
  * localCheckpoint materialization, then a separate 1-row
  * (count, bit_xor(xxhash64)) aggregate over the checkpointed frame.
  * `Dataset.observe` collects the same two longs DURING the
  * checkpoint's own materializing action, halving the per-round job
  * count. At fixture scale those scheduler-bound tiny jobs ARE the
  * wall cost (the r10 SCC adjudication measured round overhead, not
  * data, dominating the capped graph); at cluster scale one fewer
  * stage per round is one fewer scheduler round-trip on a loop that
  * runs tens of rounds.
  *
  * The signature is the house (count, bit_xor(xxhash64(cols))) pair —
  * order-independent, collision-probabilistic at 64 bits (callers
  * that need certainty confirm equality exactly once at the match,
  * as duplicateClusters does). Values are bit-identical to the old
  * two-job form: same expressions, same data, only the collection
  * vehicle changed.
  */
object Converge {

  /** Materialize `df` via eager localCheckpoint and return it with
    * its (count, xor-hash-of-`cols`) signature, in ONE job.
    * @param cols SQL column list fed to `xxhash64(...)` */
  def checkpointWithSig(df: DataFrame, cols: String): (DataFrame, (Long, Long)) =
    withSig(df, cols)(_.localCheckpoint())

  /** As [[checkpointWithSig]] but letting the caller pick the
    * materialization (reliable `.checkpoint()` for cluster runs,
    * local otherwise) — the observation fires on whichever action
    * materializes the frame.
    *
    * The metric read is DEADLINED: `Observation.get` blocks forever
    * if `materialize` never actually ran an action on the OBSERVED
    * frame (a lazy checkpoint, an identity transform, a plan rebuilt
    * from `df` instead of the observed handle) — an easy API hazard
    * for future callers — so the wait is bounded and the failure
    * names the contract instead of hanging the loop. */
  def withSig(df: DataFrame, cols: String,
              timeout: scala.concurrent.duration.Duration =
                scala.concurrent.duration.Duration(60, "s"))
             (materialize: DataFrame => DataFrame): (DataFrame, (Long, Long)) = {
    val obs = Observation()
    val ck = materialize(df.observe(obs,
      count(lit(1)).as("n"),
      coalesce(expr(s"bit_xor(xxhash64($cols))"), lit(0L)).as("h")))
    val row =
      try scala.concurrent.Await.result(obs.future, timeout)
      catch {
        case _: java.util.concurrent.TimeoutException =>
          throw new IllegalStateException(
            s"Converge.withSig: observation '${obs.name}' not completed " +
              s"after $timeout — the materialize function must run an " +
              "action on the OBSERVED frame it is given (e.g. an eager " +
              "localCheckpoint), not a lazy or rebuilt plan")
      }
    (ck, (row.getAs[Long]("n"), row.getAs[Long]("h")))
  }

  /** Exact set-equality confirmation for two same-schema frames whose
    * probabilistic signatures just matched — the "certainty at the
    * match" step ([[graft.dedup.Dedup.duplicateClusters]]'s pattern)
    * priced at ONE extra job, run once per loop, only on the
    * terminating round: given equal row counts (the count half of the
    * signature), `a \ b = ∅` under multiset semantics already implies
    * the multisets are equal. */
  def sameExact(a: DataFrame, b: DataFrame): Boolean =
    a.exceptAll(b).isEmpty
}
