package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CLUSTERABLE-embedding fixture derivation — a two-level mixture
  * model over the base `embeddings` table, the corpus geometry the
  * vector-serving frontier must be priced on (r17 verdict #1: the
  * base fixture's near-uniform unit vectors are the one regime where
  * coarse cells remove NO energy, so residual IVFADC measured BELOW
  * raw there — geometry, not implementation; this table is the
  * regime where the Jégou et al. §IV residual argument is testable).
  *
  * Vector i (cluster c = i mod [[Clusters]]):
  *
  *   mix[d] = center(c)[d] + atom(j(i, d/16))[d] + 1/16 · v[i][d]
  *
  * with rows 0..Clusters−1 planted as the EXACT centers (zero
  * residual — the coarse seeds of `KMeans.initCentroids`, so the
  * IVF chain's cells recover the true mixture components by
  * construction and the residual table is exactly atom + noise).
  * The atom layer is the part raw PQ cannot see: per 16-dim PQ
  * subspace s, each vector draws one of [[Atoms]] shared codewords
  * by a multiplicative hash of (i, s) — a discrete within-cell
  * vocabulary (norm ~2) under a small continuous noise (norm 1/16),
  * so a codebook trained on RESIDUALS can recover the atoms while
  * one trained on raw vectors spends its 16 codewords re-describing
  * the 8 coarse centers (norm ~4.6). Measured at the gate shape
  * (m = 4, k = 16, 2-probe): raw-seed IVF-PQ 8% recall@3 vs
  * residual IVFADC 49% at sf0.1 (20% vs 76% at sf0.01) — the
  * paper's prediction, inverted from the uniform fixture; dropping
  * the ⟨q, c⟩ bias costs the residual path 15 points at 2 probes
  * (MicroBench pq_ivfadc_mix, BASELINE r18).
  *
  * Cross-engine determinism contract: every constant is a multiple
  * of 2⁻¹² (binary-EXACT doubles whose decimal strings round-trip
  * identically through Spark's parser and DuckDB's
  * decimal→double conversion), the noise factor is 1/16 = 0.0625
  * (exact), atom selection is pure BIGINT arithmetic
  * ((i·K_s mod 2³²) div 2²⁸), and both engines evaluate the SAME
  * literal expression tree over the SAME parquet doubles — the
  * staged table and the oracle's inline replay are bit-identical.
  */
object MixtureEmbeddings {
  val Clusters = 8
  val Atoms = 16
  val Dims = 64
  val SubDims = 16 // Dims / 4 PQ subspaces — the gate configuration
  /** binary-exact noise scale literal (1/16) */
  val NoiseLit = "0.0625"

  /** md5-derived weight snapped to the 2⁻¹² grid then scaled:
    * binary-exact, so its decimal string parses to the identical
    * double in any engine (the [[Similarity.planeWeight]] idiom with
    * an exactness-preserving denominator). */
  private def gridWeight(tag: String, i: Int, d: Int,
                         scale: Double): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$tag:$i:$d".getBytes("UTF-8"))
    val v = java.lang.Long.parseLong(
      md.take(7).map("%02x".format(_)).mkString, 16)
    ((v % 4096L) / 4096.0 - 0.5) * scale
  }

  /** Coarse-center component, in [−1, 1) on the 2⁻¹¹ grid. */
  def centerValue(c: Int, d: Int): Double = gridWeight("center", c, d, 2.0)

  /** Within-cell atom component, in [−0.5, 0.5) on the 2⁻¹² grid. */
  def atomValue(j: Int, d: Int): Double = gridWeight("atom", j, d, 1.0)

  /** Atom index of vector `i` in PQ subspace `s` — multiplicative
    * hashing, top 4 of 32 bits: pure BIGINT, identical in any
    * engine for the non-negative ids here. */
  private def jselSql(idExpr: String, subExpr: String): String =
    s"cast((($idExpr * (2654435761L + 98304L * ($subExpr))) % 4294967296L)" +
      " div 268435456L as int)"

  /** DuckDB twin of [[jselSql]] (`//` floor-divides; ids are
    * non-negative so `%` matches pmod). */
  private def jselDuck(idExpr: String, subExpr: String): String =
    s"CAST((($idExpr * (2654435761 + 98304 * ($subExpr))) % 4294967296)" +
      " // 268435456 AS INT)"

  private def matrixLit(rows: Int, value: (Int, Int) => Double,
                        rowOpen: String, rowClose: String,
                        open: String, close: String): String =
    (0 until rows).map { r =>
      (0 until Dims).map(d => value(r, d).toString)
        .mkString(rowOpen, ", ", rowClose)
    }.mkString(open, ",\n  ", close)

  /** The 8×64 center matrix as a Spark nested-array literal. */
  private def centersSpark: String =
    matrixLit(Clusters, centerValue, "array(", ")", "array(\n  ", ")")

  private def atomsSpark: String =
    matrixLit(Atoms, atomValue, "array(", ")", "array(\n  ", ")")

  /** The same matrices as DuckDB nested-list literals. */
  private def centersDuck: String =
    matrixLit(Clusters, centerValue, "[", "]", "[\n  ", "]")

  private def atomsDuck: String =
    matrixLit(Atoms, atomValue, "[", "]", "[\n  ", "]")

  /** The clusterable table as a Spark frame: (idCol, vecCol) with
    * the mixture vector in `vecCol` — one projection over the base
    * table, the (constant-folded) center/atom matrices inlined.
    * Rows 0..Clusters−1 are the exact centers. */
  def table(base: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val mix =
      s"""transform(sequence(0, ${Dims - 1}), d ->
         |  $centersSpark[pmod($idCol, $Clusters)][d] +
         |  (CASE WHEN $idCol < $Clusters THEN 0.0D ELSE
         |    $atomsSpark[${jselSql(idCol, s"d div $SubDims")}][d] +
         |    ${NoiseLit}D * v[d] END))""".stripMargin
    base.select(col(idCol), col(vecCol).cast("array<double>").as("v"))
      .select(col(idCol), expr(mix).as(vecCol))
  }

  /** DuckDB body for the same table: SELECT (vec_id, v) replaying
    * the identical expression tree over `embeddings` — splice as a
    * CTE body wherever an oracle needs the clusterable corpus. */
  def duckBody: String =
    s"""SELECT vec_id, list_transform(generate_series(0, ${Dims - 1}), d ->
       |    $centersDuck[(vec_id % $Clusters) + 1][d + 1] +
       |    (CASE WHEN vec_id < $Clusters THEN 0.0 ELSE
       |      $atomsDuck[${jselDuck("vec_id", s"d // $SubDims")} + 1][d + 1] +
       |      $NoiseLit * v0[d + 1] END)) AS v
       |  FROM (SELECT vec_id, embedding::DOUBLE[] AS v0 FROM embeddings)"""
      .stripMargin
}
