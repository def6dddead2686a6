package org.apache.spark.sql.execution

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.{Dataset, SparkSession}

/** Package-access shim for one pathology in long checkpoint chains.
  *
  * `Dataset.localCheckpoint` truncates the plan to a [[LogicalRDD]]
  * but PRESERVES the origin plan's `Statistics` (`LogicalRDD
  * .fromDataset` — no conf gates it). In an iterative operator the
  * per-round plan joins the previous round's checkpoint several
  * times, and the size-only stats visitor MULTIPLIES child sizes
  * through joins — so the inherited `sizeInBytes` BigInt squares (or
  * worse) every round: measured on this repo's fixtures, its DIGIT
  * count doubles per round (6 → 622 digits in 8 rounds) and after a
  * few dozen checkpoint generations every stats read (JoinSelection,
  * InjectRuntimeFilter, AQE) grinds through Karatsuba/Toom-Cook
  * multiplications of million-digit integers — the q_trussness_incr
  * chain spent 100+ s per PEEL ROUND on driver-side BigInteger math
  * for 600-row frames (r16 diagnosis, jstack-confirmed).
  *
  * [[sanitize]] cuts the exponent: once a checkpointed frame's
  * inherited sizeInBytes exceeds `cap`, rebuild the SAME InternalRow
  * RDD as a LogicalRDD WITHOUT origin stats (it falls back to
  * `spark.sql.defaultSizeInBytes`, a flat Long). Partitioning,
  * ordering, and output attributes are preserved, so downstream
  * exchange reuse is untouched; only the (already meaningless)
  * astronomical estimate is dropped. Frames under the cap pass
  * through UNCHANGED — every existing green plan keeps its exact
  * statistics behavior, because no sane estimate is within 10^40 of
  * the cap. */
object GraftCheckpointStats {

  /** 2^200 ≈ 10^60 bytes — no real estimate gets near it (the
    * observable universe holds ~10^80 atoms); any inherited value
    * above is multiplicative garbage from a checkpoint chain. */
  val DefaultCap: BigInt = BigInt(2).pow(200)

  def sanitize(df: DataFrame, cap: BigInt = DefaultCap): DataFrame =
    df.queryExecution.analyzed match {
      case l: LogicalRDD if l.stats.sizeInBytes > cap =>
        val clean = LogicalRDD(l.output, l.rdd, l.outputPartitioning,
          l.outputOrdering, l.isStreaming, l.stream)(
          df.sparkSession.asInstanceOf[SparkSession], None, None)
        Dataset.ofRows(df.sparkSession.asInstanceOf[SparkSession], clean)
      case _ => df
    }
}
