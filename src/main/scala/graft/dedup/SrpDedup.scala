package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Spread
import graft.similarity.Similarity

/** Signed-random-projection (SRP) banded near-duplicate pairs over an
  * embedding column — the cosine analogue of [[Dedup.minHashPairs]]'s
  * banded MinHash, and the corpus-size-adaptive fix for the
  * fixed-granularity blocking that `SCALETEST_r10_x100` measured
  * going quadratic (q_dedup_embed 578×, q_semdedup 288× at 100×).
  *
  * Shape: `bands` independent signatures, each the sign pattern of
  * `planesPerBand` deterministic random hyperplanes (md5-derived
  * weights shared with [[Similarity.lshBucket]], so oracles replay
  * identical buckets). Candidates = pairs sharing ANY band's exact
  * key — one equi-join on (band, key), never an all-pairs product —
  * then exact-cosine verification keeps `cosine >= threshold`.
  *
  * Scale contract: with `planesPerBand = ceil(log2(n / targetBucket))`
  * ([[autoPlanesPerBand]]) expected bucket occupancy stays near
  * `targetBucket` at ANY corpus size, so candidate volume is
  * Θ(bands · n · targetBucket) — linear in n — and signature cost is
  * Θ(n · bands · log n · dims). Recall is the SRP collision bound:
  * P[share a band] = 1 − (1 − p^r)^bands with p = 1 − θ/π; at
  * near-dup thresholds (cos ≥ 0.9) recall stays high as r grows,
  * which is why this is the HIGH-threshold scale path — low
  * thresholds (0.4) genuinely require the quadratic candidate space
  * (see BASELINE's 100×-extension adjudication).
  */
object SrpDedup {

  /** Planes per band keeping expected bucket occupancy near
    * `targetBucket`: max(2, ceil(log2(n / targetBucket))). A coarser
    * corpus (n ≤ 4·targetBucket) floors at 2 planes — 4 buckets. */
  def autoPlanesPerBand(n: Long, targetBucket: Int = 32): Int = {
    require(targetBucket >= 1, s"targetBucket must be >= 1: $targetBucket")
    val buckets = math.max(1.0, n.toDouble / targetBucket)
    math.max(2, math.ceil(math.log(buckets) / math.log(2)).toInt)
  }

  /** The `bands` SRP keys of a vector as an array column; band `b`
    * folds the signs of planes [b·r, (b+1)·r) into an r-bit long
    * (bit j set iff plane b·r+j's dot is > 0). */
  def srpBandKeys(vec: Column, bands: Int, planesPerBand: Int,
                  dims: Int): Column = {
    require(bands >= 1 && planesPerBand >= 1 && dims >= 1,
      s"bands/planesPerBand/dims must be >= 1: $bands/$planesPerBand/$dims")
    array((0 until bands).map { b =>
      val bits: Seq[Column] = (0 until planesPerBand).map { j =>
        val p = b * planesPerBand + j
        val ws = array((0 until dims).map(d =>
          lit(Similarity.planeWeight(p, d))): _*)
        val dot = aggregate(zip_with(vec, ws, (x, w) => x * w),
          lit(0.0d), (s, x) => s + x)
        when(dot > 0, lit(1L << j)).otherwise(lit(0L))
      }
      bits.reduce(_ + _)
    }: _*)
  }

  /** SRP-banded near-dup pairs: (id_a, id_b, cosine) with id_a <
    * id_b and cosine ≥ threshold (rounded to 6 places). Candidate
    * generation is the (band, key) equi-join described above;
    * verification joins the (id → vector) frame twice, with the
    * exchanges sized from the MEASURED candidate count (same policy
    * as the ngram verify — [[Dedup.verifyShufflePartitions]]). */
  def srpBandedPairs(df: DataFrame, idCol: String, vecCol: String,
                     dims: Int, threshold: Double, bands: Int,
                     planesPerBand: Int): DataFrame = {
    graft.expressions.GraftFunctions.register(df.sparkSession)
    // persisted: the banding and BOTH verify joins read this subtree
    val base = Spread.ensure(df.select(col(idCol).as("id"),
        col(vecCol).cast("array<double>").as("v")))
      .persist()
    val keyed = base
      .select(col("id"),
        posexplode(srpBandKeys(col("v"), bands, planesPerBand, dims))
          .as(Seq("band", "key")))
    val cand = keyed.alias("a")
      .join(keyed.alias("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
      .persist()
    // counted for prune observability and measured verify sizing
    val n = Dedup.verifyShufflePartitions(df.sparkSession, cand.count(),
      dims.toDouble)
    val conf = Dedup.sessionShufflePartitions(df.sparkSession)
    val cos = call_function(
      graft.expressions.GraftFunctions.Cosine, col("va"), col("vb"))
    val withA = (if (n > conf) cand.repartition(n, col("id_a")) else cand)
      .join(base.select(col("id").as("id_a"), col("v").as("va")), Seq("id_a"))
    (if (n > conf) withA.repartition(n, col("id_b")) else withA)
      .join(base.select(col("id").as("id_b"), col("v").as("vb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), round(cos, 6).as("cosine"))
      .where(col("cosine") >= threshold)
  }

  /** The reusable half of SRP near-dup — (id, v, keys) with the
    * band keys materialized — the embedding analogue of
    * [[Dedup.minHashIndex]]: compute once per corpus generation and
    * SAVE it; each arriving batch then probes via
    * [[srpPairsAgainstIndex]] without re-keying the corpus (at
    * 100 TB the corpus-side signature pass is the dominant cost and
    * must not repeat per batch). The plane count is fixed at
    * index-build time — pick it with [[autoPlanesPerBand]] over the
    * CORPUS size; probes must be keyed with the same geometry
    * (same bands × planes) or the band equi-join silently finds
    * nothing — persist the geometry beside the index. */
  def srpIndex(df: DataFrame, idCol: String, vecCol: String, dims: Int,
               bands: Int, planesPerBand: Int): DataFrame =
    Spread.ensure(df.select(col(idCol).as("id"),
        col(vecCol).cast("array<double>").as("v")))
      .select(col("id"), col("v"),
        srpBandKeys(col("v"), bands, planesPerBand, dims).as("keys"))

  /** (id, band, key) rows of a [[srpIndex]] frame. */
  private def banded(base: DataFrame): DataFrame =
    base.select(col("id"),
      posexplode(col("keys")).as(Seq("band", "key")))

  /** Incremental embedding near-dup: probe a NEW batch against a
    * saved corpus index (both sides [[srpIndex]] outputs with
    * disjoint id spaces, identical band geometry). Same collision
    * contract as [[srpBandedPairs]], but the candidate join is
    * probe-bands × index-bands instead of a self-join, so per-batch
    * cost scales with the batch, not the corpus — the
    * [[Dedup.minHashPairsAgainstIndex]] shape. The probe (small by
    * contract) is persisted across its two reads; the index is
    * scan-only on both reads (it lives in storage at scale).
    * Returns (probe_id, index_id, cosine) with cosine ≥ threshold. */
  def srpPairsAgainstIndex(probe: DataFrame, index: DataFrame,
                           threshold: Double): DataFrame = {
    graft.expressions.GraftFunctions.register(probe.sparkSession)
    val p = probe.persist()
    val cand = banded(p).alias("a")
      .join(banded(index).alias("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key"))
      .select(col("a.id").as("probe_id"), col("b.id").as("index_id"))
      .distinct()
    val cos = call_function(
      graft.expressions.GraftFunctions.Cosine, col("va"), col("vb"))
    cand
      .join(p.select(col("id").as("probe_id"), col("v").as("va")),
        Seq("probe_id"))
      .join(index.select(col("id").as("index_id"), col("v").as("vb")),
        Seq("index_id"))
      .select(col("probe_id"), col("index_id"),
        round(cos, 6).as("cosine"))
      .where(col("cosine") >= threshold)
  }

  /** [[srpBandedPairs]] with the corpus-size-adaptive plane count:
    * one count() pass picks `planesPerBand` via
    * [[autoPlanesPerBand]], so bucket occupancy — and with it
    * candidate volume per vector — stays constant from sf0.001 to
    * web scale. */
  def srpBandedPairsAuto(df: DataFrame, idCol: String, vecCol: String,
                         dims: Int, threshold: Double, bands: Int = 4,
                         targetBucket: Int = 32): DataFrame = {
    val n = df.count()
    srpBandedPairs(df, idCol, vecCol, dims, threshold, bands,
      autoPlanesPerBand(n, targetBucket))
  }
}
