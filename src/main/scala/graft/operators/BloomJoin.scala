package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-pruned (semi-join-reduced) equi-join: build a Bloom filter
  * over the small side's join keys, broadcast it, and filter the big
  * probe side BEFORE its shuffle — the classic semi-join reduction
  * (Bloom, CACM 1970; the same idea behind Spark's own
  * `spark.sql.optimizer.runtimeFilter.bloomFilter.enabled` runtime
  * filters, applied here explicitly so the reduction is guaranteed
  * rather than cost-model-dependent).
  *
  * At 100 TB the dominant cost of `fact ⋈ filtered_dim` is shuffling
  * the fact table; when the dim side retains a small fraction of
  * keys, pruning fact rows at the scan/filter stage cuts the shuffle
  * volume by the key-selectivity factor for the price of a broadcast
  * of `~1.2·n·ln(1/fpp)` bits. False positives survive the prefilter
  * but are eliminated by the exact join that follows — the result is
  * IDENTICAL to the plain join, so the oracle is the plain join.
  *
  * The probe is a driver-built `BloomFilter` broadcast into a scalar
  * UDF (Spark exposes no public might_contain expression), which
  * breaks codegen for that one filter — the trade documented at
  * `Decontaminate.contaminationScoresBloom`: a few xxhash
  * evaluations per row buy the elimination of the probe-side
  * shuffle volume.
  */
object BloomJoin {

  /** Inner equi-join of `probe` (big) with `build` (small) on
    * `probe(probeKey) === build(buildKey)`, with the probe side
    * Bloom-prefiltered. Keys must be integral (hashed upstream if
    * not — `TextFunctions.hash64` for strings).
    *
    * @param fpp false-positive rate; only affects pruning efficiency,
    *            never correctness (the join is exact)
    */
  def bloomPrunedJoin(probe: DataFrame, probeKey: String,
                      build: DataFrame, buildKey: String,
                      fpp: Double = 0.01): DataFrame = {
    val spark = probe.sparkSession
    val keys = build.select(col(buildKey)).distinct().persist()
    val n = math.max(keys.count(), 64L) // sizes the filter; one action
    val filter = keys.stat.bloomFilter(buildKey, n, fpp)
    val bcast = spark.sparkContext.broadcast(filter)
    val mightContain = udf((k: java.lang.Long) =>
      k != null && bcast.value.mightContainLong(k))
    val pruned = probe.where(mightContain(col(probeKey).cast("long")))
    val out = pruned.join(build, pruned(probeKey) === build(buildKey))
    keys.unpersist(blocking = false)
    out
  }
}
