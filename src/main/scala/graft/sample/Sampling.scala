package graft.sample

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Deterministic sampling for training-data pipelines.
  *
  * `df.sample()` is seed-dependent AND partitioning-dependent — rerun
  * the pipeline after a repartition and a different subset comes out,
  * which poisons ablations and dataset reproducibility. These
  * operators decide membership per ROW from the md5-derived
  * `TextFunctions.hash64` of a stable id, so the same row makes the
  * same decision on any cluster, any partitioning, any engine (the
  * DuckDB oracle mirrors the predicate exactly).
  *
  * Scale shape: a narrow filter over the scan — no shuffle, no state;
  * composes with column pruning and predicate pushdown untouched.
  */
object Sampling {

  private val Buckets = 1000000L // ppm granularity

  /** Membership bucket in [0, 1e6): uniform over ids. A salt yields
    * independent samples from the same ids (train/validation splits). */
  def bucket(idCol: Column, salt: String = ""): Column =
    pmod(TextFunctions.hash64(concat(idCol.cast("string"), lit(salt))),
      lit(Buckets))

  /** Keep ~`fraction` of rows, decided per row by id hash. */
  def deterministicSample(df: DataFrame, idCol: String, fraction: Double,
                          salt: String = ""): DataFrame = {
    require(fraction >= 0 && fraction <= 1, "fraction in [0,1]")
    df.where(bucket(col(idCol), salt) < (fraction * Buckets).toLong)
  }

  /** Per-stratum fractions (e.g. language mixture weights); strata
    * absent from `fractions` are dropped — the explicit mixture spec
    * IS the contract, matching how training mixtures are declared. */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String,
                       fractions: Map[String, Double],
                       salt: String = ""): DataFrame = {
    require(fractions.values.forall(f => f >= 0 && f <= 1))
    val thresh = fractions.foldLeft(lit(-1L)) { case (acc, (k, f)) =>
      when(col(strataCol) === k, lit((f * Buckets).toLong)).otherwise(acc)
    }
    df.where(bucket(col(idCol), salt) < thresh)
  }

  /** Resample to TARGET OUTPUT PROPORTIONS by downsampling only:
    * given desired mixture weights (e.g. en 0.4, de 0.2, …), compute
    * the largest output size reachable without upsampling —
    * N_out = min over groups of n_g / p_g — and keep each group at
    * rate N_out·p_g / n_g. The binding (scarcest-relative-to-target)
    * group is kept in full; overrepresented groups thin to match.
    * Groups absent from `targets` are dropped (the mixture spec is
    * the contract, as in `stratifiedSample`).
    *
    * Distributed shape: one tiny groupBy count (#groups rows), a
    * 1-row global min, and a broadcast join of per-group thresholds
    * back onto the scan — the data side stays a narrow filtered scan
    * with no shuffle. Membership is the same deterministic
    * hash-bucket predicate as `deterministicSample`, so the kept set
    * is stable across partitionings, reruns, and engines. */
  def mixtureResample(df: DataFrame, groupCol: String, idCol: String,
                      targets: Map[String, Double],
                      salt: String = ""): DataFrame = {
    require(targets.nonEmpty && targets.values.forall(p => p > 0 && p <= 1),
      "target proportions must be in (0,1]")
    val targetExpr = targets.foldLeft(lit(null).cast("double")) {
      case (acc, (k, p)) => when(col(groupCol) === k, lit(p)).otherwise(acc)
    }
    // explicit IN filter: dropping non-target groups via the when-chain
    // alone leaves only a CASE predicate on the scans, which parquet
    // cannot push; isin pushes as an In filter (same row set — the
    // threshold join restricts to target groups either way)
    val inTargets = col(groupCol).isin(targets.keys.toSeq: _*)
    val rated = df.where(inTargets)
      .groupBy(col(groupCol)).agg(count(lit(1)).as("n_g"))
      .withColumn("p_g", targetExpr)
      .where(col("p_g").isNotNull)
    val nOut = rated.agg(min(col("n_g") / col("p_g")).as("n_out"))
    // ((n_out * p_g) / n_g) * Buckets, floored — the oracle mirrors
    // this exact operation order (IEEE doubles are order-sensitive)
    val thresholds = rated.crossJoin(broadcast(nOut))
      .select(col(groupCol),
        floor(col("n_out") * col("p_g") / col("n_g") * lit(Buckets))
          .cast("long").as("keep_below"))
    df.where(inTargets).join(broadcast(thresholds), Seq(groupCol))
      .where(bucket(col(idCol), salt) < col("keep_below"))
      .drop("keep_below")
  }

  /** Per-group quota: keep at most `cap` rows of each group — the
    * per-domain cap of web-corpus curation (no single site dominates
    * the training mix). Rows are ranked by the deterministic id hash
    * (id as tiebreak on bucket collisions), so the kept subset is an
    * unbiased within-group sample — not a crawl-order prefix — and
    * identical on any partitioning, rerun, or engine.
    *
    * Scale shape: `row_number() <= cap` is rewritten by Spark's
    * InferWindowGroupLimit (3.5+) into a WindowGroupLimit that trims
    * every map partition to `cap` rows per group BEFORE the shuffle —
    * a hot domain ships O(cap × tasks) rows, not its full count.
    * SamplingSpec asserts the rewrite is present in the plan. */
  def capPerGroup(df: DataFrame, groupCol: String, idCol: String,
                  cap: Int, salt: String = ""): DataFrame = {
    require(cap > 0, "cap must be positive")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(bucket(col(idCol), salt), col(idCol))
    val rn = graft.operators.Spread.freshCol(df, "__rn")
    df.withColumn(rn, row_number().over(w))
      .where(col(rn) <= cap).drop(rn)
  }

  /** Deterministic weight-biased top-k per group: rank by the integer
    * priority `hash(id) div weight` ascending — a row with w× the
    * weight gets a w×-compressed priority range, so selection
    * probability grows with weight (the integer-exact cousin of
    * Efraimidis–Spirakis u^(1/w) sampling; the float form can't be
    * oracle-compared because pow() differs across engines in the last
    * ulp, flipping ranks at ties). Reproducible under reruns,
    * repartitioning, and engine swaps; same WindowGroupLimit map-side
    * trim as [[capPerGroup]].
    *
    * Weights must be positive integers (cast/ceil first). */
  def weightedSample(df: DataFrame, groupCol: String, idCol: String,
                     weightCol: String, k: Int, salt: String = ""): DataFrame = {
    require(k > 0, "k must be positive")
    // floor(double-div) here equals exact integer division: the
    // bucket is < 1e6 and weights are ≥ 1, so the correctly-rounded
    // IEEE quotient sits ≥ 1/w > ulp away from any integer it could
    // incorrectly cross
    //
    // the positive-integer contract is enforced, not just documented:
    // a zero weight would divide to Infinity here but NULL in a SQL
    // mirror — engines silently diverging is worse than failing
    val wOk = col(weightCol).isNotNull && col(weightCol) >= 1
    val pri = when(wOk,
      floor(bucket(col(idCol), salt).cast("double") /
        col(weightCol).cast("double")).cast("long"))
      .otherwise(raise_error(concat(
        lit(s"weightedSample: $weightCol must be a positive integer, got "),
        col(weightCol).cast("string"))))
    val w = Window.partitionBy(col(groupCol)).orderBy(pri, col(idCol))
    val rn = graft.operators.Spread.freshCol(df, "__rn")
    df.withColumn(rn, row_number().over(w))
      .where(col(rn) <= k).drop(rn)
  }

  /** Disjoint train/holdout split: rows route to exactly one side. */
  def split(df: DataFrame, idCol: String, holdoutFraction: Double,
            salt: String = ""): (DataFrame, DataFrame) = {
    val cut = (holdoutFraction * Buckets).toLong
    val b = bucket(col(idCol), salt)
    (df.where(b >= cut), df.where(b < cut))
  }

  /** Leakage-safe train/holdout assignment: a plain per-id split lets
    * two NEAR-DUPLICATE documents land on opposite sides, leaking
    * training text into the holdout (the classic eval-contamination
    * bug). Here every row routes by its duplicate-cluster
    * REPRESENTATIVE — `cluster_id` from `clusters` (the
    * `Dedup.duplicateClusters` output shape `(id, cluster_id)`;
    * un-clustered docs fall back to their own id) — so a whole
    * near-dup cluster always lands on ONE side.
    *
    * Scale shape: one left equi-join docs × clusters (clusters holds
    * only ids that appear in a near-dup pair — a small fraction of the
    * corpus, so AQE broadcasts it) plus the per-row hash route.
    * Returns docs ++ (rep, split ∈ {train, holdout}). */
  def leakageSafeSplit(docs: DataFrame, idCol: String, clusters: DataFrame,
                       holdoutFraction: Double, salt: String = ""): DataFrame = {
    require(holdoutFraction >= 0 && holdoutFraction <= 1,
      "holdoutFraction in [0,1]")
    val cut = (holdoutFraction * Buckets).toLong
    val cl = graft.operators.Spread.freshCol(docs, "__cl")
    docs
      .join(clusters.select(col("id").as(idCol), col("cluster_id").as(cl)),
        Seq(idCol), "left")
      .withColumn("rep", coalesce(col(cl), col(idCol)))
      .withColumn("split",
        when(bucket(col("rep"), salt) < cut, lit("holdout"))
          .otherwise(lit("train")))
      .drop(cl)
  }
}
