package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Deterministic ±1 random projection (Johnson–Lindenstrauss via
  * Achlioptas, "Database-friendly random projections", PODS 2001):
  * reduce SQ8-quantized embeddings from `d` to `k` dimensions with a
  * sign matrix whose entries are a pure function of (out-dim, in-dim)
  * through the repo-wide md5 `hash64` — the matrix is IMPLICIT, so
  * nothing is broadcast, nothing random is stored, and any engine
  * (the DuckDB oracle included) regenerates it bit-identically.
  * Composing with `Quantize.encode` keeps the arithmetic INTEGER:
  * out_j = Σ_i sign(j,i)·code_i is exact, unlike a float projection
  * whose sum order varies.
  *
  * Scale shape: explode codes × k target dims (k is small — 4..32),
  * then one groupBy(id, j) with map-side combine; shuffle carries
  * n·k projected cells, never the d-dim vectors. This is the cheap
  * front half of projected-LSH / compact re-ranking sketches: the
  * projected integers feed the same banding machinery as SimHash.
  */
object Projection {

  /** ±1 from the shared hash — the same debiasing convention as
    * `FeatureHash.sign`. */
  private def sign(j: org.apache.spark.sql.Column,
                   i: org.apache.spark.sql.Column) =
    when(pmod(TextFunctions.hash64(
      concat(j.cast("string"), lit("#"), i.cast("string"))), lit(2L)) === 0L,
      lit(1L)).otherwise(lit(-1L))

  /** Project `Quantize.encode`-shaped rows (id, dim, code) to `k`
    * output dimensions: (id, j, proj) with
    * proj = Σ_dim sign(j, dim)·code. */
  def projectCodes(codes: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    codes.select(col("id"), col("dim"), col("code"),
        explode(sequence(lit(0), lit(k - 1))).as("j"))
      .groupBy(col("id"), col("j"))
      .agg(sum(sign(col("j"), col("dim")) * col("code")).as("proj"))
  }

  /** End-to-end: quantize an embedding corpus (SQ8) and project to
    * `k` dims. Returns (idCol, j, proj). */
  def quantizeAndProject(corpus: DataFrame, idCol: String, vecCol: String,
                         k: Int, levels: Int = 256): DataFrame =
    projectCodes(Quantize.encode(corpus, idCol, vecCol, levels), k)
      .withColumnRenamed("id", idCol)
}
