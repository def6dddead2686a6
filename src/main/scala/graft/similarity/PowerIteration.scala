package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Converge.SanitizedCheckpoint

/** Dominant principal direction of a quantized embedding corpus by
  * power iteration, in EXACT fixed point — distributed linear algebra
  * with the same reproducibility contract as the ppm PageRank: float
  * power iteration can never hash-match an independent engine (the
  * Gram reduction order varies), integer arithmetic can.
  *
  * Two stages:
  *  1. Gram matrix G[a,b] = Σ_vec code_a·code_b — one equi-join of
  *     the (vec, dim, code) rows with themselves on vec (rows are
  *     already co-located by vec after `Quantize.encode`'s scan:
  *     the join is narrow), aggregated to d² cells with map-side
  *     combine, so the SHUFFLE carries at most partitions·d² cells
  *     no matter how many vectors — the CPU does n·d² multiplies,
  *     which is what an exact Gram costs anywhere.
  *  2. Power iteration on the d²-cell table: y = G·x as a broadcast
  *     join + aggregate; normalization by the max component (all
  *     quantities are non-negative — Perron–Frobenius keeps the
  *     iterate positive), x' = 10⁶·y div max(y) in floor arithmetic.
  *     Sums run in DECIMAL(38,0), so no corpus size can overflow.
  *
  * The result after enough rounds is the top eigenvector direction of
  * the (uncentered) second-moment matrix, L∞-normalized to ppm — the
  * "which way does this corpus point" diagnostic that drives IVF
  * axis choices and quantizer rotation decisions.
  */
object PowerIteration {

  /** @param codes `Quantize.encode`-shaped rows (id, dim, code)
    * @param iters fixed round count (unrolled identically by the
    *              oracle); convergence is geometric in the spectral
    *              gap — 3-5 rounds separate a dominant direction
    * @return (dim, component_ppm): the iterate after `iters` rounds,
    *         max component = 10⁶ */
  def principalDirection(codes: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    val c = codes.select(col("id"), col("dim"), col("code"))
    val g = c.alias("a").join(c.alias("b"), col("a.id") === col("b.id"))
      .groupBy(col("a.dim").as("da"), col("b.dim").as("db"))
      .agg(sum(col("a.code") * col("b.code")).as("g"))
      .persist() // d² cells, read every round
    g.count()
    var x = g.select(col("da").as("dim")).distinct()
      .select(col("dim"), lit(1000000L).cast("decimal(38,0)").as("v"))
    for (_ <- 1 to iters) {
      val y = g
        .join(x.withColumnRenamed("dim", "db"), Seq("db"))
        .groupBy(col("da"))
        .agg(sum(col("g").cast("decimal(38,0)") * col("v")).as("y"))
      val m = y.agg(max(col("y")).as("m"))
      x = y.crossJoin(m) // 1-row scalar
        .select(col("da").as("dim"), expr("(1000000 * y) div m")
          .cast("decimal(38,0)").as("v"))
        .sanitizedCheckpoint() // bound plan depth per round
    }
    val out = x.select(col("dim"), col("v").cast("long").as("component_ppm"))
      .sanitizedCheckpoint()
    g.unpersist(blocking = false)
    out
  }
}
