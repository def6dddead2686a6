package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HyperBall — ALL-nodes neighborhood-function / centrality
  * estimation with per-node HyperLogLog sketches (Boldi & Vigna,
  * "In-Core Computation of Geometric Centralities with HyperBall",
  * ICDMW 2013; the HyperANF line of work). Where
  * [[Sssp.bfsDistancesPerSource]] prices k pivots × a BFS sweep to
  * estimate centrality from a SAMPLE, HyperBall holds one m-register
  * HLL sketch per node — the approximate set of nodes within radius
  * r — and grows every node's ball simultaneously: per radius, each
  * node max-merges its out-neighbors' sketches into its own. After
  * the radius-r pass the sketch estimates |B(v, r)|, and the
  * neighborhood-function deltas yield harmonic centrality for EVERY
  * node in O(maxRadius) passes over the edges.
  *
  * This is the 100-TB centrality algorithm: state is m small
  * integers per node (m = 16 here — registers, not samples), each
  * pass is ONE equi-join (edges ⋈ sparse register rows, partitioned
  * by the join key) + one (node, bucket) max partial-agg, and the
  * row volume is bounded by m·E per pass regardless of graph
  * diameter or ball sizes — where exact per-source BFS state is
  * O(k·V) pairs for k pivots and all-pairs is V². The trade is
  * accuracy: HLL standard error 1.04/√m (~26% at m = 16; production
  * raises m, cost is linear in it) on EVERY node, vs exact distances
  * on a pivot sample.
  *
  * Determinism/oracle: registers derive from the house md5-based
  * `hash64` (engine-portable), the merge is a max, and the estimate
  * replays [[graft.sketch.Sketches.hllDistinctByKey]]'s exact
  * arithmetic at m = 16 — S = Σ 2^(57−r) is an exact long, the raw
  * α·m² estimate runs in DECIMAL(38,0) floor division, and the
  * small-range linear-counting branch rounds `m·ln(m/V)` where V's
  * 16 possible values cannot straddle a rounding boundary — so a
  * fixed-radius DuckDB unroll hash-matches bit for bit.
  *
  * Early stop is the empty delta (see the loop comment): no changed
  * registers means every later ball is identical, so the remaining
  * radii emit the converged estimate — equal to the full unroll by
  * construction.
  */
object HyperBall {

  /** m = 16 registers (p = 4) over hash64's 60-bit space: bucket =
    * top 4 bits, rho = leading-one rank of the remaining 56 bits
    * (57 − bin-length; an all-zero remainder ranks 57). */
  private val TwoPow56 = 72057594037927936L

  /** Per-node neighborhood-function estimates at every radius
    * 0..maxRadius: (node, r, nf_est). Sparse register rows — only
    * buckets a node's ball has touched materialize; the estimate
    * spine fills the rest with rank 0. */
  private val M = 16
  private def regCols = (0 until M).map(b => col(s"r$b"))
  private def regNames = (0 until M).map(b => s"r$b")

  def neighborhoodFunction(edges: DataFrame, srcCol: String,
                           dstCol: String, maxRadius: Int): DataFrame = {
    require(maxRadius >= 0, s"maxRadius must be >= 0, got $maxRadius")
    val e = edges.select(col(srcCol).as("node"), col(dstCol).as("nxt"))
      .distinct().persist()
    e.count()
    val nodes = e.select(col("node"))
      .unionByName(e.select(col("nxt").as("node"))).distinct()
    // COLUMNAR sketches: the m registers are m int COLUMNS per node,
    // not m (node, bucket, r) rows. Same math, but every join moves
    // E wide rows instead of m·E narrow ones, the merge is m
    // codegen'd max aggregates with map-side combine, and the
    // estimate is a pure projection (no register-spine join). The
    // row-amplified layout was built first and measured 20.7 s at
    // sf0.1 — per-row overhead (hashing, agg machinery) × m dominated.
    // Radius 0: every node's ball is itself — its own hash's bucket
    // carries the rank, every other register is 0.
    val sigCols = regNames.mkString("node, ", ", ", "")
    val init = nodes
      .select(col("node"),
        graft.functions.TextFunctions.hash64(col("node").cast("string"))
          .as("h"))
      .select(col("node"), expr(s"h div ${TwoPow56}L").as("bucket"),
        col("h").%(TwoPow56).as("w"))
      .select(col("node") +: (0 until M).map { b =>
        when(col("bucket") === b,
          when(col("w") === 0, lit(57))
            .otherwise(lit(57) - length(expr("bin(w)"))))
          .otherwise(lit(0)).cast("int").as(s"r$b")
      }: _*)
    var (regs, _) =
      graft.operators.Converge.checkpointWithSig(init, sigCols)
    var estCur = estimate(regs)
    var out = estCur.withColumn("r", lit(0L))
    // DELTA propagation (the HyperBall paper's systolic form): only
    // nodes whose sketch CHANGED last radius are pushed through the
    // join — an unchanged neighbor contributes exactly what it
    // contributed last radius, already max-folded into this node's
    // sketch, so skipping it is lossless and the join volume shrinks
    // as balls saturate. Radius 0's "delta" is every node.
    // Convergence = an empty delta: nothing changed, so no later
    // radius can change anything — the remaining radii emit the
    // converged estimate, equal to the full unroll.
    var delta = regs
    var nDelta = 1L
    for (h <- 1 to maxRadius) {
      if (nDelta > 0) {
        val prop = e
          .join(delta.withColumnRenamed("node", "nxt"), Seq("nxt"))
          .select(col("node") +: regCols: _*)
        val merged = regs.unionByName(prop).groupBy(col("node"))
          .agg(max(col("r0")).as("r0"),
            (1 until M).map(b => max(col(s"r$b")).as(s"r$b")): _*)
        val (next, _) =
          graft.operators.Converge.checkpointWithSig(merged, sigCols)
        // registers only grow, so any field inequality = changed
        val changed = next.join(
            regs.select(col("node") +:
              (0 until M).map(b => col(s"r$b").as(s"p$b")): _*),
            Seq("node"))
          .where((0 until M).map(b => col(s"r$b") =!= col(s"p$b"))
            .reduce(_ || _))
          .select(col("node") +: regCols: _*)
        val (nextDelta, (n, _)) =
          graft.operators.Converge.checkpointWithSig(changed, sigCols)
        regs = next
        delta = nextDelta
        nDelta = n
        if (nDelta > 0) estCur = estimate(regs)
        // nDelta == 0 ⇒ regs identical to last radius ⇒ estCur
        // already holds this and every later radius's estimate
      }
      out = out.unionByName(estCur.withColumn("r", lit(h.toLong)))
    }
    val res = out.select(col("node"), col("r"), col("nf_est"))
    e.unpersist()
    res
  }

  /** [[graft.sketch.Sketches.hllDistinctByKey]]'s estimator at
    * m = 16 as a pure projection over the columnar sketch: exact-
    * integer S = Σ_b 2^(57−r_b), DECIMAL(38,0) raw α_16·m²·2^57 div
    * (1000·S) with α_16 = 0.673 (673·256 = 172288), linear counting
    * below raw ≤ 2.5·m = 40. Returns (node, nf_est). */
  private def estimate(regs: DataFrame): DataFrame = {
    val sExpr = (0 until M)
      .map(b => s"shiftleft(1L, cast(57 - r$b as int))").mkString(" + ")
    val vExpr = (0 until M)
      .map(b => s"(case when r$b = 0 then 1 else 0 end)").mkString(" + ")
    regs
      .select(col("node"), expr(sExpr).as("S"),
        expr(vExpr).cast("long").as("V"))
      .withColumn("raw", expr(
        "cast(cast(172288 as decimal(38,0)) * cast(shiftleft(1L, 57) as " +
          "decimal(38,0)) div (cast(1000 as decimal(38,0)) * " +
          "cast(S as decimal(38,0))) as bigint)"))
      .select(col("node"),
        when(col("raw") <= 40 && col("V") > 0,
          round(lit(16) * log(lit(16.0) / col("V"))).cast("long"))
          .otherwise(col("raw")).as("nf_est"))
  }

  /** The wide per-node summary a curation pipeline consumes:
    * neighborhood-function estimates at radii 0..3 plus approximate
    * harmonic centrality Σ_{r≥1} (nf_r − nf_{r−1})·10⁶ div r — the
    * HyperBall paper's headline metric, here in exact-ppm integer
    * arithmetic over the (already approximate) nf estimates so the
    * oracle replays it. Deltas may go slightly negative where the
    * estimator switches off its linear-counting branch; the signed
    * truncating div matches across engines. */
  def harmonicSummary(edges: DataFrame, srcCol: String,
                      dstCol: String): DataFrame = {
    val nf = neighborhoodFunction(edges, srcCol, dstCol, maxRadius = 3)
    nf.groupBy(col("node"))
      .agg(
        max(when(col("r") === 0, col("nf_est"))).as("nf0"),
        max(when(col("r") === 1, col("nf_est"))).as("nf1"),
        max(when(col("r") === 2, col("nf_est"))).as("nf2"),
        max(when(col("r") === 3, col("nf_est"))).as("nf3"))
      .select(col("node").as("node_id"),
        col("nf0"), col("nf1"), col("nf2"), col("nf3"),
        expr("(nf1 - nf0) * 1000000 div 1 + (nf2 - nf1) * 1000000 div 2" +
          " + (nf3 - nf2) * 1000000 div 3").as("harmonic_ppm"))
  }
}
