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
  * integers per node (m = 16 at the gate — registers, not samples),
  * each pass is ONE equi-join (edges ⋈ sparse register rows,
  * partitioned by the join key) + one (node, bucket) max partial-agg,
  * and the row volume is bounded by m·E per pass regardless of graph
  * diameter or ball sizes — where exact per-source BFS state is
  * O(k·V) pairs for k pivots and all-pairs is V². The trade is
  * accuracy: HLL standard error 1.04/√m (~26% at m = 16, ~13% at the
  * production m = 64 — `m` is a parameter here, cost linear in it)
  * on EVERY node, vs exact distances on a pivot sample.
  *
  * Determinism/oracle: registers derive from the house md5-based
  * `hash64` (engine-portable), the merge is a max, and the estimate
  * replays [[graft.sketch.Sketches.hllDistinctByKey]]'s exact
  * arithmetic — S = Σ 2^(maxRank−r) is an exact long, the raw
  * α·m² estimate runs in DECIMAL(38,0) floor division, and the
  * small-range linear-counting branch rounds `m·ln(m/V)` where V's
  * m possible values cannot straddle a rounding boundary — so a
  * fixed-radius DuckDB unroll hash-matches bit for bit.
  *
  * Early stop is the empty delta (see the loop comment): no changed
  * registers means every later ball is identical, so the remaining
  * radii emit the converged estimate — equal to the full unroll by
  * construction.
  */
object HyperBall {

  /** Supported register counts and their HLL bias constants α·1000
    * (Flajolet et al. 2007: α₁₆=0.673, α₃₂=0.697, α₆₄=0.709). The
    * gate runs m = 16; m = 64 is the production accuracy point
    * (error 1.04/√m: ~26% vs ~13%). Registers split hash64's 60-bit
    * space: bucket = top log₂(m) bits, rho = leading-one rank of the
    * remaining (60−log₂ m) bits — maxRank = 61 − log₂(m); an
    * all-zero remainder ranks maxRank. */
  private val Alpha1000 = Map(16 -> 673L, 32 -> 697L, 64 -> 709L)

  private final case class Layout(m: Int) {
    require(Alpha1000.contains(m), s"unsupported register count m=$m " +
      s"(supported: ${Alpha1000.keys.toSeq.sorted.mkString(", ")})")
    val p: Int = 31 - Integer.numberOfLeadingZeros(m)
    val maxRank: Int = 61 - p
    val wMod: Long = 1L << (60 - p) // hash remainder modulus
    val alpha1000: Long = Alpha1000(m)
    def regCols: Seq[org.apache.spark.sql.Column] =
      (0 until m).map(b => col(s"r$b"))
    def regNames: Seq[String] = (0 until m).map(b => s"r$b")
    def sigCols: String = regNames.mkString("node, ", ", ", "")
  }

  /** Per-node neighborhood-function estimates at every radius
    * 0..maxRadius: (node, r, nf_est). */
  def neighborhoodFunction(edges: DataFrame, srcCol: String,
                           dstCol: String, maxRadius: Int,
                           m: Int = 16): DataFrame = {
    val lay = Layout(m)
    val perRadius = registerFrames(edges, srcCol, dstCol, maxRadius, lay)
    perRadius.zipWithIndex.map { case (regs, r) =>
      estimate(regs, lay).withColumn("r", lit(r.toLong))
    }.reduce(_ unionByName _)
      .select(col("node"), col("r"), col("nf_est"))
  }

  /** The propagation's raw state as one frame — (node, r,
    * r0..r{m−1}) for every radius 0..maxRadius — the SAVED-ARTIFACT
    * form [[neighborhoodFunctionIncremental]] repairs from. Persist
    * it `partitionBy("r")` so per-radius reads prune. */
  def registerTable(edges: DataFrame, srcCol: String, dstCol: String,
                    maxRadius: Int, m: Int = 16): DataFrame = {
    val lay = Layout(m)
    registerFrames(edges, srcCol, dstCol, maxRadius, lay).zipWithIndex
      .map { case (regs, r) => regs.withColumn("r", lit(r.toLong)) }
      .reduce(_ unionByName _)
  }

  /** The propagation core: columnar register frames per radius
    * (index r → (node, r0..r{m−1}), each checkpointed). */
  private def registerFrames(edges: DataFrame, srcCol: String,
                             dstCol: String, maxRadius: Int,
                             lay: Layout): Seq[DataFrame] = {
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
    var (regs, regSig) =
      graft.operators.Converge.checkpointWithSig(
        initRegs(nodes, lay), lay.sigCols)
    val out = scala.collection.mutable.ArrayBuffer(regs)
    // DELTA propagation (the HyperBall paper's systolic form): only
    // nodes whose sketch CHANGED last radius are pushed through the
    // join — an unchanged neighbor contributes exactly what it
    // contributed last radius, already max-folded into this node's
    // sketch, so skipping it is lossless and the join volume shrinks
    // as balls saturate. Radius 0's "delta" is every node.
    // Convergence = an empty delta: nothing changed, so no later
    // radius can change anything — the remaining radii emit the
    // converged registers, equal to the full unroll.
    var delta = regs
    var nDelta = regSig._1
    for (_ <- 1 to maxRadius) {
      if (nDelta > 0) {
        // r18 optimization (guide §2.3/§2.4): aggregate the
        // CONTRIBUTIONS alone (map-combined, ≤V rows cross the wire)
        // and merge them into the register table with one left join
        // carrying a per-node GREW flag — replacing the old
        // union-agg over V+|prop| wide rows PLUS a second V×V join
        // just to detect change, and halving the round's job count
        // (one checkpoint instead of two; the delta frame is a
        // filter over the checkpointed rows, its count collected by
        // the checkpoint's own observation). Registers only grow, so
        // grew ⟺ some contribution exceeds the stored register —
        // identical delta semantics, identical merged values
        // (greatest over the same contribution set).
        // r19 (guide §3.1): the delta is ≤V wide rows and shrinks
        // as balls saturate — broadcast it while small so the edge
        // list streams unshuffled (bounded by the same guard as the
        // incremental repair's changed set; radius 1's full-V delta
        // is register rows, ~100 B each, well under the cap)
        val deltaR = delta.withColumnRenamed("node", "nxt")
        val deltaB =
          if (nDelta <= DefaultBroadcastChangedMax) broadcast(deltaR)
          else deltaR
        val contrib = e
          .join(deltaB, Seq("nxt"))
          .select(col("node") +: lay.regCols: _*)
          .groupBy(col("node"))
          .agg(max(col("r0")).as("c0"),
            (1 until lay.m).map(b => max(col(s"r$b")).as(s"c$b")): _*)
        val merged = regs.join(contrib, Seq("node"), "left_outer")
          .select(col("node") +: ((0 until lay.m).map(b =>
            greatest(col(s"r$b"), coalesce(col(s"c$b"), lit(0)))
              .as(s"r$b")) :+
            (0 until lay.m).map(b =>
              coalesce(col(s"c$b"), lit(0)) > col(s"r$b"))
              .reduce(_ || _).as("grew")): _*)
        val (next, _, nGrew) = graft.operators.Converge
          .checkpointWithSigCount(merged, lay.sigCols, "grew")
        regs = next.select(col("node") +: lay.regCols: _*)
        delta = next.where(col("grew"))
          .select(col("node") +: lay.regCols: _*)
        nDelta = nGrew
      }
      out += regs
    }
    e.unpersist()
    out.toSeq
  }

  /** Radius-0 columnar sketch of a node frame: the node's own hash's
    * bucket carries its rank, every other register is 0. */
  private def initRegs(nodes: DataFrame, lay: Layout): DataFrame =
    nodes
      .select(col("node"),
        graft.functions.TextFunctions.hash64(col("node").cast("string"))
          .as("h"))
      .select(col("node"), expr(s"h div ${lay.wMod}L").as("bucket"),
        col("h").%(lay.wMod).as("w"))
      .select(col("node") +: (0 until lay.m).map { b =>
        when(col("bucket") === b,
          when(col("w") === 0, lit(lay.maxRank))
            .otherwise(lit(lay.maxRank) - length(expr("bin(w)"))))
          .otherwise(lit(0)).cast("int").as(s"r$b")
      }: _*)

  /** INCREMENTAL neighborhood-function maintenance — the saved-index
    * idiom ([[Sssp.bfsDistancesIncremental]], `minHashIndex`) applied
    * to the all-nodes sketch substrate: given the SAVED per-radius
    * register table of a prior [[registerTable]] run over `edges` and
    * a batch of NEW edges, repair only the sketches the batch can
    * change instead of re-propagating the whole graph.
    *
    * Soundness: HLL registers only GROW under edge inserts (a bigger
    * ball max-merges a superset), so the saved table is a valid
    * under-approximation of the union graph's registers and max-merge
    * confluence lets improvements be folded in any order. UNLIKE the
    * BFS repair, the radius-bounded recurrence has no empty-frontier
    * fixpoint shortcut: R'_r(v) = R'_{r−1}(v) ⊔ ⨆_{(v,u)} R'_{r−1}(u)
    * re-reads the new edges at EVERY radius (a changed set that is
    * empty at radius r can regrow at r+1 through a new edge whose
    * head's ball grew), so the loop always runs maxRadius rounds —
    * each pricing one |newEdges|-keyed join against the saved radius
    * frame plus joins proportional to the changed region, never a
    * full-graph propagation.
    *
    * Per radius r the candidate contributions beyond saved_r(v) are
    * exactly: (a) full R'_{r−1}(u) through each new edge (v,u) —
    * split as saved_{r−1}(u) ⊔ changed_{r−1}(u), (b) changed_{r−1}(u)
    * through EVERY union edge (v,u), and (c) the node's own
    * changed_{r−1}(v) (balls are monotone in r). Everything else is
    * ⊆ saved_r(v) by the old run's own recurrence. Nodes introduced
    * by the batch have no saved rows; they seed changed_0 with their
    * self-sketch and stay in the changed set at every radius.
    *
    * The result is row-identical to a full [[neighborhoodFunction]]
    * over old ∪ new edges at the same maxRadius and m — the
    * equivalence the oracle and spec gate.
    *
    * @param savedRegs (node, r, r0..r{m−1}) rows covering every
    *                  radius 0..maxRadius, from [[registerTable]]
    *                  over `edges` (a table saved at a SMALLER radius
    *                  breaks the repair contract and is rejected)
    */
  def neighborhoodFunctionIncremental(edges: DataFrame,
                                      newEdges: DataFrame,
                                      srcCol: String, dstCol: String,
                                      savedRegs: DataFrame,
                                      maxRadius: Int,
                                      m: Int = 16,
                                      broadcastChangedMax: Long =
                                        DefaultBroadcastChangedMax): DataFrame = {
    val lay = Layout(m)
    require(maxRadius >= 0, s"maxRadius must be >= 0, got $maxRadius")
    // cast: a partitionBy("r") artifact reads r back as an inferred
    // INT partition column even though the writer emitted a long
    val savedMax =
      savedRegs.agg(max(col("r").cast("long"))).head().getLong(0)
    require(savedMax >= maxRadius,
      s"saved register table covers radii 0..$savedMax, need $maxRadius")
    def savedAt(r: Int): DataFrame =
      savedRegs.where(col("r") === r.toLong)
        .select(col("node") +: lay.regCols: _*)
    // persisted + forced BEFORE the fan-out into ne/allE: both legs
    // reference oldE, and a lazily-persisted frame recomputes its
    // build under concurrent downstream stages — the old shape paid
    // the edge canonicalization twice (r19, guide §5)
    val oldE = edges.select(col(srcCol).as("node"), col(dstCol).as("nxt"))
      .distinct().persist()
    oldE.count()
    // truly-new edges only: a batch edge already present contributes
    // nothing (its head's sketch is max-folded into saved already)
    // but would pull full saved sketches through the per-radius join
    val ne = newEdges
      .select(col(srcCol).as("node"), col(dstCol).as("nxt")).distinct()
      .join(oldE, Seq("node", "nxt"), "left_anti").persist()
    val allE = oldE.unionByName(ne).persist()
    allE.count(); val neN = ne.count()
    // radius 0: only nodes the batch INTRODUCES differ from saved —
    // an old node's radius-0 ball is itself regardless of edges
    val neNodes = ne.select(col("node"))
      .unionByName(ne.select(col("nxt").as("node"))).distinct()
    val newNodes = neNodes.join(savedAt(0), Seq("node"), "left_anti")
    var (changed, (nChanged, _)) = graft.operators.Converge
      .checkpointWithSig(initRegs(newNodes, lay), lay.sigCols)
    var out = outputAt(savedAt(0), changed, nChanged, 0, lay,
      broadcastChangedMax)
    for (r <- 1 to maxRadius) {
      // r19 (guide §3.1): the batch edge set and the per-radius
      // changed set are small by the repair contract — broadcasting
      // them keeps the big sides (the pruned saved-radius scan, the
      // persisted union edge list) entirely unshuffled; past
      // broadcastChangedMax the shuffled join is the safe plan (the
      // outputAt guard, applied to the loop joins)
      val neB = if (neN <= broadcastChangedMax) broadcast(ne) else ne
      val viaNew = neB
        .join(savedAt(r - 1).withColumnRenamed("node", "nxt"), Seq("nxt"))
        .select(col("node") +: lay.regCols: _*)
      val chN = changed.withColumnRenamed("node", "nxt")
      val chB =
        if (nChanged <= broadcastChangedMax) broadcast(chN) else chN
      val viaChanged = allE.join(chB, Seq("nxt"))
        .select(col("node") +: lay.regCols: _*)
      val cand = viaNew.unionByName(viaChanged).unionByName(changed)
        .groupBy(col("node"))
        .agg(max(col("r0")).as("r0"),
          (1 until lay.m).map(b => max(col(s"r$b")).as(s"r$b")): _*)
      // genuine change = some candidate register exceeds the saved
      // radius-r one (absent saved row = all-zero: a new node)
      val joined = cand.join(
          savedAt(r).select(col("node") +:
            (0 until lay.m).map(b => col(s"r$b").as(s"p$b")): _*),
          Seq("node"), "left")
      val changedNext = joined
        .where((0 until lay.m)
          .map(b => col(s"r$b") > coalesce(col(s"p$b"), lit(0)))
          .reduce(_ || _))
        .select(col("node") +: (0 until lay.m).map(b =>
          greatest(col(s"r$b"), coalesce(col(s"p$b"), lit(0)))
            .cast("int").as(s"r$b")): _*)
      val (ck, (n, _)) = graft.operators.Converge
        .checkpointWithSig(changedNext, lay.sigCols)
      changed = ck
      nChanged = n
      out = out.unionByName(
        outputAt(savedAt(r), changed, nChanged, r, lay,
          broadcastChangedMax))
    }
    // out's legs reference only per-radius checkpoints and the saved
    // parquet — the persisted edge frames are loop-internal
    oldE.unpersist(); ne.unpersist(); allE.unpersist()
    out.select(col("node"), col("r"), col("nf_est"))
  }

  /** Default for `broadcastChangedMax`: past this many changed nodes
    * the [[outputAt]] anti-join stops hinting broadcast. The
    * small-batch repair contract usually keeps the changed set tiny,
    * but a batch that perturbs most of the graph would otherwise
    * force a near-full-node-set broadcast onto the driver. 1M ids
    * ≈ 8 MB — comfortably broadcastable; above, the shuffled
    * anti-join is the safe plan. Callers (and the spec/bench probes)
    * pass their own threshold through the
    * [[neighborhoodFunctionIncremental]] parameter — this was a
    * mutable JVM-global seam in r16, which raced with any concurrent
    * HyperBall repair in the same session (r16 advice #1). */
  val DefaultBroadcastChangedMax = 1000000L

  /** Radius-r estimates for the repaired state: saved rows for
    * unchanged nodes, the changed rows otherwise. The anti-join's
    * right side is the (small, checkpointed) changed set, skipped
    * entirely when the radius changed nothing and broadcast only
    * while it stays under `broadcastChangedMax`. */
  private def outputAt(saved: DataFrame, changed: DataFrame,
                       nChanged: Long, r: Int, lay: Layout,
                       broadcastChangedMax: Long): DataFrame = {
    val state =
      if (nChanged == 0) saved
      else {
        val ids = changed.select(col("node"))
        val right =
          if (nChanged <= broadcastChangedMax) broadcast(ids) else ids
        saved.join(right, Seq("node"), "left_anti").unionByName(changed)
      }
    estimate(state, lay).withColumn("r", lit(r.toLong))
  }

  /** [[graft.sketch.Sketches.hllDistinctByKey]]'s estimator as a pure
    * projection over the columnar sketch: exact-integer
    * S = Σ_b 2^(maxRank−r_b), DECIMAL(38,0) raw α_m·m²·2^maxRank div
    * (1000·S), linear counting below raw ≤ 2.5·m. Returns
    * (node, nf_est), plus any `carry` columns passed through. */
  private def estimate(regs: DataFrame, lay: Layout,
                       carry: Seq[String] = Nil): DataFrame = {
    val sExpr = (0 until lay.m)
      .map(b => s"shiftleft(1L, cast(${lay.maxRank} - r$b as int))")
      .mkString(" + ")
    val vExpr = (0 until lay.m)
      .map(b => s"(case when r$b = 0 then 1 else 0 end)").mkString(" + ")
    val num = lay.alpha1000 * lay.m * lay.m
    val carried = carry.map(col)
    regs
      .select(col("node") +: carried :+ expr(sExpr).as("S") :+
        expr(vExpr).cast("long").as("V"): _*)
      .withColumn("raw", expr(
        s"cast(cast($num as decimal(38,0)) * " +
          s"cast(shiftleft(1L, ${lay.maxRank}) as decimal(38,0)) div " +
          "(cast(1000 as decimal(38,0)) * cast(S as decimal(38,0))) " +
          "as bigint)"))
      .select(col("node") +: carried :+
        when(col("raw") <= lay.m * 5 / 2 && col("V") > 0,
          round(lit(lay.m) * log(lit(lay.m.toDouble) / col("V")))
            .cast("long"))
          .otherwise(col("raw")).as("nf_est"): _*)
  }

  /** Estimates from a SAVED register table ([[registerTable]]'s
    * frame): the estimator is a pure per-row projection, so serving
    * from the staged artifact is one scan — the r18 dedup of the
    * HyperBall family's shared sketch-build: stage the propagation
    * once, let the nf/harmonic consumers read it. Returns
    * (node, r, nf_est) — [[neighborhoodFunction]]'s frame exactly,
    * row-identical to a fresh propagation by max-merge determinism. */
  def neighborhoodFunctionFromRegisters(regs: DataFrame,
                                        m: Int = 16): DataFrame =
    estimate(regs, Layout(m), carry = Seq("r"))
      .select(col("node"), col("r"), col("nf_est"))

  /** The wide per-node summary a curation pipeline consumes, from an
    * nf frame covering radii 0..3: neighborhood-function estimates
    * plus approximate harmonic centrality Σ_{r≥1} (nf_r − nf_{r−1})
    * ·10⁶ div r — the HyperBall paper's headline metric, in exact-ppm
    * integer arithmetic over the (already approximate) nf estimates
    * so the oracle replays it. Deltas may go slightly negative where
    * the estimator switches off its linear-counting branch; the
    * signed truncating div matches across engines. */
  def harmonicFromNf(nf: DataFrame): DataFrame =
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

  /** [[harmonicFromNf]] over a fresh radius-3 propagation. `m` is the
    * register count (16 = the cheap gate default, 64 = the production
    * ±13% accuracy tier — priced at ~1.5× the m=16 propagation, see
    * BASELINE r15's hyperball_m probe). */
  def harmonicSummary(edges: DataFrame, srcCol: String,
                      dstCol: String, m: Int = 16): DataFrame =
    harmonicFromNf(
      neighborhoodFunction(edges, srcCol, dstCol, maxRadius = 3, m = m))
}
