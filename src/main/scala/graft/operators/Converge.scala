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
    * materializes the frame. */
  def withSig(df: DataFrame, cols: String)
             (materialize: DataFrame => DataFrame): (DataFrame, (Long, Long)) = {
    val obs = Observation()
    val ck = materialize(df.observe(obs,
      count(lit(1)).as("n"),
      coalesce(expr(s"bit_xor(xxhash64($cols))"), lit(0L)).as("h")))
    val m = obs.getAsJava
    (ck, (m.get("n").asInstanceOf[Long], m.get("h").asInstanceOf[Long]))
  }
}
