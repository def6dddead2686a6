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
    *
    * The checkpoint's INHERITED statistics are sanitized past a cap
    * ([[org.apache.spark.sql.execution.GraftCheckpointStats]]):
    * localCheckpoint preserves the origin plan's sizeInBytes, and a
    * loop whose round joins the previous checkpoint k times grows
    * that BigInt's digit count k× PER ROUND — after a few dozen
    * generations the driver spends minutes in BigInteger multiplies
    * on every stats read (the r16 q_trussness_incr diagnosis:
    * 100+ s peel rounds over 600-row frames, all driver-side).
    * Frames with sane estimates pass through untouched.
    * @param cols SQL column list fed to `xxhash64(...)` */
  def checkpointWithSig(df: DataFrame, cols: String): (DataFrame, (Long, Long)) = {
    val (ck, sig) = withSig(df, cols)(_.localCheckpoint())
    (org.apache.spark.sql.execution.GraftCheckpointStats.sanitize(ck), sig)
  }

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
    * names the contract instead of hanging the loop. A driver whose
    * listener bus genuinely lags past the default 60 s can raise the
    * deadline fleet-wide via `spark.graft.converge.timeoutSec`
    * (session conf) without touching call sites. */
  def withSig(df: DataFrame, cols: String,
              timeout: scala.concurrent.duration.Duration = null)
             (materialize: DataFrame => DataFrame): (DataFrame, (Long, Long)) = {
    val (ck, sig, _) = observedSig(df, cols, None, timeout)(materialize)
    (ck, sig)
  }

  /** The one observe/await/read path both signature entry points
    * share (r18 advice: checkpointWithSigCount used to duplicate the
    * machinery and dropped the lazy-materialization diagnosis from
    * its timeout message). `pred` optionally adds a flag count
    * collected in the same materializing job. */
  private def observedSig(df: DataFrame, cols: String,
                          pred: Option[String],
                          timeout: scala.concurrent.duration.Duration)
                         (materialize: DataFrame => DataFrame)
      : (DataFrame, (Long, Long), Long) = {
    val deadline =
      if (timeout != null) timeout
      else scala.concurrent.duration.Duration(
        df.sparkSession.conf.get("spark.graft.converge.timeoutSec", "60").toLong,
        "s")
    val obs = Observation()
    val metrics = Seq(
      count(lit(1)).as("n"),
      coalesce(expr(s"bit_xor(xxhash64($cols))"), lit(0L)).as("h")) ++
      pred.map(p => count(when(expr(p), lit(1))).as("c"))
    val ck = materialize(df.observe(obs, metrics.head, metrics.tail: _*))
    val row =
      try scala.concurrent.Await.result(obs.future, deadline)
      catch {
        case _: java.util.concurrent.TimeoutException =>
          throw new IllegalStateException(
            s"Converge: observation '${obs.name}' not completed " +
              s"after $deadline — either the materialize function never ran " +
              "an action on the OBSERVED frame it is given (it must, e.g. " +
              "an eager localCheckpoint — not a lazy or rebuilt plan), or " +
              "the driver's listener bus is lagging/dropping events (raise " +
              "the timeout via spark.graft.converge.timeoutSec)")
      }
    (ck, (row.getAs[Long]("n"), row.getAs[Long]("h")),
      pred.fold(0L)(_ => row.getAs[Long]("c")))
  }

  /** As [[checkpointWithSig]] plus a flag-count collected in the SAME
    * materializing job: returns (frame, (count, hash), #rows where
    * `pred` holds). The r18-optimization loop shape — a round that
    * materializes its merged state once and derives its next frontier
    * as a FILTER over the checkpointed rows ([[graft.graph.Sssp]]
    * repairs, HyperBall's delta) — needs the frontier size for the
    * stop test; counting it inside the checkpoint's own observation
    * keeps the round at ONE job instead of checkpoint + count. */
  def checkpointWithSigCount(df: DataFrame, cols: String,
                             pred: String): (DataFrame, (Long, Long), Long) = {
    val (ck, sig, c) =
      observedSig(df, cols, Some(pred), null)(_.localCheckpoint())
    (org.apache.spark.sql.execution.GraftCheckpointStats.sanitize(ck),
      sig, c)
  }

  /** The house checkpoint form — `df.sanitizedCheckpoint()` is an
    * eager localCheckpoint routed through the stats sanitizer
    * ([[org.apache.spark.sql.execution.GraftCheckpointStats]]).
    * Bare `.localCheckpoint()` is BANNED outside this file
    * (CheckpointConventionSpec greps for it): a single-join loop
    * over a bare checkpoint only grows the inherited sizeInBytes
    * linearly (harmless), but the next multiplicative loop someone
    * writes over that frame re-arms the r16 BigInteger stats bomb —
    * the convention makes every checkpoint in the repo immune
    * instead of auditing loop shapes. Frames with sane estimates
    * pass through byte-identical, so adopting the form changes no
    * plan and no hash. */
  implicit class SanitizedCheckpoint(private val df: DataFrame)
      extends AnyVal {
    def sanitizedCheckpoint(): DataFrame =
      org.apache.spark.sql.execution.GraftCheckpointStats
        .sanitize(df.localCheckpoint())
  }

  /** Exact multiset-equality confirmation for two same-schema frames —
    * the "certainty at the match" step
    * ([[graft.dedup.Dedup.duplicateClusters]]'s pattern) run once per
    * loop, only on the terminating round whose probabilistic
    * signatures just matched. SELF-CONTAINED equality: one pass
    * computing `count(a \ b) + count(b \ a)` under multiset
    * semantics — `a.exceptAll(b).isEmpty` alone would answer true when
    * `a` is a proper sub-multiset of `b`, silently relying on the
    * caller having matched row counts first (true at today's call
    * sites, a trap for tomorrow's). Still one extra job: the two
    * exceptAlls union into a single action. */
  def sameExact(a: DataFrame, b: DataFrame): Boolean =
    a.exceptAll(b).unionAll(b.exceptAll(a)).isEmpty
}
