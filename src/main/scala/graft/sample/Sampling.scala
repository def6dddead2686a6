package graft.sample

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Disjoint train/holdout split: rows route to exactly one side. */
  def split(df: DataFrame, idCol: String, holdoutFraction: Double,
            salt: String = ""): (DataFrame, DataFrame) = {
    val cut = (holdoutFraction * Buckets).toLong
    val b = bucket(col(idCol), salt)
    (df.where(b >= cut), df.where(b < cut))
  }
}
