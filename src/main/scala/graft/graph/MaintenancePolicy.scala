package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The repair-vs-recompute envelope as an OPERATOR (r17 verdict #3):
  * r17 measured the crossovers (MicroBench ktruss_uncapped /
  * kcore_uncapped, BASELINE r17) but callers had to know them by
  * reading BASELINE — this policy turns the measured envelope into a
  * decision made FROM THE DATA: two distinct-edge counts (scans the
  * maintenance would do anyway) price the batch/graph ratio, and the
  * ratio routes to the saved-artifact repair inside its measured win
  * window and to the cold recompute outside it.
  *
  * Default thresholds and their provenance (1.2M-edge uncapped
  * purchase graph, BASELINE r17 — parameters, not constants, because
  * the crossover is a property of the CLUSTER and the graph's
  * triangle density, and a 100 TB operator should re-measure on its
  * own workload):
  *  - insert 400000 ppm: repair measured 1.6× cheaper than cold at a
  *    250000 ppm batch; the linear extrapolation of that margin puts
  *    the crossover near 40% — repair keeps winning through the
  *    measured point with headroom, larger batches recompute.
  *  - delete 50000 ppm: repair measured SLOWER than recompute at a
  *    200000 ppm batch (the expansion walk touches most of the truss
  *    once a fifth of it retracts), and no smaller delete batch was
  *    measured — so only trickle batches repair, conservatively.
  */
object MaintenancePolicy {

  val InsertRepairMaxPpm = 400000L
  val DeleteRepairMaxPpm = 50000L

  /** One routing decision: the counted sizes, the floor-ppm ratio,
    * the threshold applied, and the verdict. */
  final case class Decision(direction: String, batchEdges: Long,
                            baseEdges: Long, ratioPpm: Long,
                            thresholdPpm: Long, repair: Boolean) {
    def choice: String = if (repair) "repair" else "recompute"
  }

  /** Pure routing from pre-counted sizes — exact floor-ppm ratio
    * (BigInt intermediate: edge counts at 100 TB overflow a long
    * multiply), repair iff ratio ≤ threshold. An empty base graph
    * recomputes (there is nothing to repair into). */
  def decide(direction: String, batchEdges: Long, baseEdges: Long,
             insertRepairMaxPpm: Long = InsertRepairMaxPpm,
             deleteRepairMaxPpm: Long = DeleteRepairMaxPpm): Decision = {
    val threshold = direction match {
      case "insert" => insertRepairMaxPpm
      case "delete" => deleteRepairMaxPpm
      case other => throw new IllegalArgumentException(
        s"direction must be 'insert' or 'delete': $other")
    }
    val ratioPpm =
      if (baseEdges <= 0L) 1000000L
      else (BigInt(batchEdges) * 1000000 / BigInt(baseEdges)).toLong
    Decision(direction, batchEdges, baseEdges, ratioPpm, threshold,
      repair = baseEdges > 0L && ratioPpm <= threshold)
  }

  /** k-truss maintenance under the policy: counts the DISTINCT
    * batch/base edge sets, then routes —
    *  - insert within window  → [[KTruss.kTrussIncremental]] from
    *    `saved` (region expansion + bounded re-peel);
    *  - insert beyond         → cold [[KTruss.kTruss]] of
    *    base ∪ batch;
    *  - delete within window  → [[KTruss.kTrussDeleted]] from
    *    `saved`;
    *  - delete beyond         → cold peel of base ∖ batch (the
    *    retraction the repair would have applied, recomputed).
    * Both routes of each direction are EQUIVALENT by the r16/r17
    * equivalence gates, so the policy changes cost, never results.
    * Returns the k-truss edges with the decision logged as a
    * `choice` column. */
  def kTrussAuto(base: DataFrame, batch: DataFrame, srcCol: String,
                 dstCol: String, direction: String, saved: DataFrame,
                 k: Int, maxExpandRounds: Int, maxPeelRounds: Int,
                 insertRepairMaxPpm: Long = InsertRepairMaxPpm,
                 deleteRepairMaxPpm: Long = DeleteRepairMaxPpm): DataFrame = {
    def edgeCount(df: DataFrame): Long =
      df.select(col(srcCol), col(dstCol)).distinct().count()
    val d = decide(direction, edgeCount(batch), edgeCount(base),
      insertRepairMaxPpm, deleteRepairMaxPpm)
    val out = (d.direction, d.repair) match {
      case ("insert", true) =>
        KTruss.kTrussIncremental(base, batch, srcCol, dstCol, saved,
          k, maxExpandRounds, maxPeelRounds)
      case ("insert", false) =>
        KTruss.kTruss(base.unionByName(batch), srcCol, dstCol, k,
          maxPeelRounds)
      case ("delete", true) =>
        KTruss.kTrussDeleted(base, batch, srcCol, dstCol, saved,
          k, maxExpandRounds, maxPeelRounds)
      case ("delete", false) =>
        KTruss.kTruss(base.join(batch.select(col(srcCol), col(dstCol)),
            Seq(srcCol, dstCol), "left_anti"), srcCol, dstCol, k,
          maxPeelRounds)
    }
    out.withColumn("choice", lit(d.choice))
  }
}
