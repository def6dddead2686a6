package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Converge.SanitizedCheckpoint

/** PageRank over an edge table, in EXACT fixed-point arithmetic.
  *
  * Classic (non-normalized) formulation: pr(v) = (1−d) + d·Σ_{u→v}
  * pr(u)/outdeg(u), run for a fixed iteration count. All arithmetic is
  * integer (parts-per-million fixed point, floor division), so the
  * result is bit-identical regardless of partitioning, reduction
  * order, or engine — an iterative float PageRank can NEVER be
  * oracle-compared exactly, a fixed-point one can.
  *
  * Scale design: each iteration is one equi-join (edges ⋈ ranks on
  * src) and one groupBy(dst) sum; rank state is one row per node
  * (tiny next to the edge table) and broadcasts when small (AQE), so
  * the per-round shuffle is only the partially-aggregated
  * contributions — map-side combine caps it at
  * min(edges, partitions × nodes) rows, usually far below edge
  * volume. Iterations are a fixed small constant (PageRank converges
  * geometrically; 3-10 rounds), so plan depth is bounded — for big
  * iteration counts checkpoint every few rounds like
  * `Dedup.duplicateClusters`. Overflow bound: the worst
  * case is a hub receiving the whole rank mass, so damping·Σpr must
  * fit a long: n_nodes · SCALE · DAMPING_PPM < 2⁶³ gives
  * n ≈ 1.1×10⁷ nodes at this scale. Past that the `wide` path moves
  * the per-node contribution sum AND the damping multiply to
  * DECIMAL(38,0) (exact — identical results where both paths are in
  * range), raising the ceiling to a single NODE's rank overflowing a
  * long (total mass n·SCALE ⇒ n ≈ 9×10¹² nodes). By default the path
  * is probed automatically from the (already-materialized) node
  * count.
  */
object PageRank {
  val Scale = 1000000L // 1.0 in ppm fixed point

  /** @param edges  directed edges (srcCol, dstCol); make it symmetric
    *               beforehand for an undirected graph
    * @param wide   Some(b) forces the DECIMAL(38,0) arithmetic on/off;
    *               None (default) probes the node count and widens
    *               exactly when long damping arithmetic could overflow
    * @param prepartitionByDst hash-partition the cached edge table by
    *               dst so every round's groupBy(dst) reuses the layout
    *               (zero per-round exchange) at the cost of shuffling
    *               the FULL edge table once up front. Only worth it
    *               when iters × (per-round combined shuffle) exceeds
    *               edge volume — i.e. many iterations, or partitions
    *               so node-dense that map-side combine stops
    *               shrinking the contribution shuffle. Measured at
    *               sf0.1 (1M edges, 16k nodes, 3 iters): OFF 4.96 s
    *               vs ON 6.34 s — partial aggregation already caps
    *               the per-round shuffle, so the upfront edge
    *               shuffle never amortized.
    * @return (node_id, pr_ppm): rank in ppm fixed point, exact */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int, dampingPpm: Long = 850000L,
               wide: Option[Boolean] = None,
               prepartitionByDst: Boolean = false): DataFrame = {
    require(iters >= 1 && dampingPpm >= 0 && dampingPpm <= Scale)
    // materialize ONE degree-annotated edge table up front: every
    // iteration joins against it, and an unpersisted plan would re-run
    // the whole upstream pipeline (scans, joins, distinct) plus the
    // degree join once per round. Persisting (src, dst, outdeg) keeps
    // each round to a single join + aggregate; the rank side
    // broadcasts (AQE, one row per node) and each round's groupBy(dst)
    // combines map-side before shuffling, so per-round exchange is the
    // combined contributions, not the edge table (see
    // prepartitionByDst for when layout reuse beats that).
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val edJoined = e.join(deg, Seq("src"))
    val ed = (if (prepartitionByDst) edJoined.repartition(col("dst"))
              else edJoined).persist()
    val edCount = ed.count()
    val nodes = ed.select(col("src").as("node")).distinct().persist()
    // overflow probe: damping·Σpr wraps a long iff the total rank mass
    // n·SCALE exceeds Long.Max/dampingPpm — i.e. n > Long.Max /
    // (dampingPpm·SCALE) (≈1.085×10⁷ at the default damping). The
    // already-materialized edge count bounds n from above (every node
    // is the src of ≥1 edge row), so in-range graphs decide for FREE;
    // only past the bound is the exact (cached-distinct) node count
    // paid — trivial next to a 10⁷-edge iteration.
    val useWide = wide.getOrElse {
      dampingPpm > 0 && {
        val safeNodes = Long.MaxValue / (dampingPpm * Scale)
        edCount > safeNodes && nodes.count() > safeNodes
      }
    }
    val pr0 = nodes.select(col("node"), lit(Scale).as("pr_ppm"))
    // materialize the (one-row-per-node) result, then release the two
    // iteration caches — a long-lived session running many queries
    // must not accumulate cached blocks (localCheckpoint keeps the
    // result readable after the unpersist)
    val out = iterate(ed, nodes, pr0, iters, dampingPpm, useWide)
    ed.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    out
  }

  /** WARM-START PageRank — resume the exact ppm iteration from a
    * SAVED rank vector for `iters` more rounds over the (possibly
    * grown) edge table: the rank family's member of the saved-index
    * repair matrix. After an edge batch, a pipeline resumes from the
    * converged artifact instead of re-running the full schedule from
    * uniform — rounds-to-reconverge tracks the batch's perturbation,
    * not the graph's mixing time (measured in BASELINE r16's
    * pagerank_warm probe). Nodes the batch introduces (absent from
    * `savedRanks`) seed at the uniform init value SCALE, exactly as a
    * cold start would seed them.
    *
    * Contract is TRAJECTORY-exact, not fixpoint-exact: resuming over
    * an UNCHANGED graph continues the cold trajectory verbatim
    * (resume(g, pageRank(g, i), j) = pageRank(g, i+j) — the spec-
    * proven identity, and what makes the staged-artifact oracle
    * replayable as one longer unroll). Equality of CONVERGED warm and
    * cold runs after a batch is deliberately NOT the contract: the
    * floor-ppm map admits adjacent fixpoints (on a 2-cycle with
    * d = 0.85, both t = 10⁶ and t = 10⁶ − 1 satisfy
    * t = 150000 + ⌊0.85·t⌋), so two trajectories may legitimately
    * settle 1 ppm apart — a property of exact integer PageRank
    * itself, not of the warm start. */
  def pageRankResume(edges: DataFrame, srcCol: String, dstCol: String,
                     savedRanks: DataFrame, iters: Int,
                     dampingPpm: Long = 850000L,
                     wide: Option[Boolean] = None): DataFrame = {
    require(iters >= 1 && dampingPpm >= 0 && dampingPpm <= Scale)
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val ed = e.join(deg, Seq("src")).persist()
    val edCount = ed.count()
    val nodes = ed.select(col("src").as("node")).distinct().persist()
    val useWide = wide.getOrElse {
      dampingPpm > 0 && {
        val safeNodes = Long.MaxValue / (dampingPpm * Scale)
        edCount > safeNodes && nodes.count() > safeNodes
      }
    }
    val pr0 = nodes
      .join(savedRanks.select(col("node_id").as("node"), col("pr_ppm")),
        Seq("node"), "left")
      .select(col("node"),
        coalesce(col("pr_ppm"), lit(Scale)).as("pr_ppm"))
    val out = iterate(ed, nodes, pr0, iters, dampingPpm, useWide)
    ed.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    out
  }

  /** WEIGHTED PageRank — rank mass flows proportionally to integer
    * edge weights instead of uniformly over out-edges:
    * pr(v) = (1−d) + d·Σ_{u→v} ⌊pr(u)·w(u,v) / W(u)⌋ with
    * W(u) = Σ w(u,·), the multiplicity-aware variant (a customer who
    * bought from a supplier 40 times pushes 40× the rank of a
    * one-off link — the natural purchase-graph semantics, and the
    * [[graft.graph.Sssp]] weightedDistances precedent at the rank
    * family). All arithmetic stays exact integer ppm: the per-edge
    * contribution multiplies BEFORE the floor division
    * (pr·w div W — exact, order-free), so the long bound tightens
    * from pr ≤ n·SCALE to pr·w_max < 2⁶³: fine to w_max ≈ 9.2×10⁵ at
    * the ~10⁷-node narrow-path ceiling, far above any per-pair order
    * multiplicity; wider graphs widen exactly like [[pageRank]].
    * Same per-round shape: one equi-join + one map-combined groupBy.
    *
    * @param wCol integer weight column ≥ 1 on `edges`
    * @param wide Some(b) forces the DECIMAL(38,0) arithmetic on/off;
    *             None (default) probes max(w) and the node count and
    *             widens exactly when the long per-edge multiply
    *             (pr·w, pr bounded by n·SCALE) or the damping
    *             multiply could overflow — the [[pageRank]] probe
    *             with the weight folded into the bound, so
    *             out-of-range graphs widen instead of silently
    *             wrapping */
  def pageRankWeighted(edges: DataFrame, srcCol: String, dstCol: String,
                       wCol: String, iters: Int,
                       dampingPpm: Long = 850000L,
                       wide: Option[Boolean] = None): DataFrame =
    weightedRun(edges, srcCol, dstCol, wCol, None, iters, dampingPpm, wide)

  /** WARM-START weighted PageRank — [[pageRankResume]]'s discipline
    * at the weighted map: resume the exact multiply-before-floor
    * iteration from a SAVED rank vector for `iters` more rounds over
    * the (possibly changed) weighted edge table. Trajectory-exact
    * with the same adjacent-fixpoint caveat as the uniform pair;
    * nodes the batch introduces seed at the uniform init SCALE.
    * Weight changes ride for free: W(u) and every w re-derive from
    * the edge table each call, so an edge whose multiplicity grew
    * simply contributes at its new proportion from round one. */
  def pageRankWeightedResume(edges: DataFrame, srcCol: String,
                             dstCol: String, wCol: String,
                             savedRanks: DataFrame, iters: Int,
                             dampingPpm: Long = 850000L,
                             wide: Option[Boolean] = None): DataFrame =
    weightedRun(edges, srcCol, dstCol, wCol, Some(savedRanks), iters,
      dampingPpm, wide)

  private def weightedRun(edges: DataFrame, srcCol: String, dstCol: String,
                          wCol: String, saved: Option[DataFrame],
                          iters: Int, dampingPpm: Long,
                          wide: Option[Boolean]): DataFrame = {
    require(iters >= 1 && dampingPpm >= 0 && dampingPpm <= Scale)
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
      col(wCol).cast("long").as("w"))
    // one edge pass builds BOTH the per-source weight sum the
    // iteration divides by and the per-source max weight the
    // overflow probe needs — the probe then reads this node-sized
    // frame, never the edge table (an extra max() pass over the
    // persisted edge frame measured ~1.5× the whole gate at 10×,
    // SCALETEST_r18 A/B)
    val wagg = e.groupBy(col("src"))
      .agg(sum(col("w")).as("wsum"), max(col("w")).as("wmax"))
      .persist()
    val nodeCount = wagg.count()
    val ed = e.join(wagg.select(col("src"), col("wsum")), Seq("src"))
      .persist()
    ed.count()
    val nodes = wagg.select(col("src").as("node")).persist()
    nodes.count()
    // overflow probe (the pageRank discipline, weight-aware): pr is
    // bounded by n·SCALE (hub worst case), so the per-edge multiply
    // pr·w wraps iff n·SCALE·max(w) ≥ 2⁶³ and the damping multiply
    // iff n·SCALE·dampingPpm does. One 1-row agg over the node-sized
    // wagg frame prices max(w). Threshold arithmetic runs in BigInt
    // driver-side (max(w) itself may be large enough that maxW·SCALE
    // wraps a long).
    val useWide = wide.getOrElse {
      val maxW = math.max(1L,
        wagg.agg(max(col("wmax"))).head().getLong(0))
      val mult = BigInt(math.max(maxW, dampingPpm)) * Scale
      val safeNodes = BigInt(Long.MaxValue) / mult
      BigInt(nodeCount) > safeNodes
    }
    wagg.unpersist(blocking = false)
    val base = lit(Scale - dampingPpm)
    val coldInit = lit(Scale)
    var pr = saved match {
      case None => nodes.select(col("node"), coldInit.as("pr_ppm"))
      case Some(sv) => nodes
        .join(sv.select(col("node_id").as("node"),
          col("pr_ppm").as("saved_pr")), Seq("node"), "left")
        .select(col("node"),
          coalesce(col("saved_pr"), coldInit).as("pr_ppm"))
    }
    for (_ <- 1 to iters) {
      // wide: the per-edge multiply AND the damping multiply run in
      // DECIMAL(38,0) — `div` is integral divide on decimals too
      // (returns BIGINT), so floor semantics match the long path
      // exactly for the non-negative values here
      val contrib = ed
        .join(pr.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst"),
          (if (useWide)
             expr("cast((cast(pr_ppm as decimal(38,0)) * w) div wsum " +
               "as bigint)")
           else expr("(pr_ppm * w) div wsum")).as("c"))
      val agg = contrib.groupBy(col("dst")).agg(
        (if (useWide) sum(col("c").cast("decimal(38,0)"))
         else sum(col("c"))).as("s"))
      val damped =
        if (useWide) expr(
          s"cast(($dampingPpm * coalesce(s, cast(0 as decimal(38,0)))) " +
            s"div $Scale as bigint)")
        else expr(s"($dampingPpm * coalesce(s, 0L)) div $Scale")
      pr = nodes
        .join(agg.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .select(col("node"), (base + damped).as("pr_ppm"))
    }
    val out = pr.select(col("node").as("node_id"), col("pr_ppm"))
      .sanitizedCheckpoint()
    ed.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    out
  }

  /** The shared iteration: `iters` exact ppm rounds from `pr0` over
    * the degree-annotated (persisted) edge table. */
  private def iterate(ed: DataFrame, nodes: DataFrame, pr0: DataFrame,
                      iters: Int, dampingPpm: Long,
                      useWide: Boolean): DataFrame = {
    val base = lit(Scale - dampingPpm)
    var pr = pr0
    // deliberately NOT broadcast(pr) per round: an explicit broadcast
    // collects eagerly, so round k's broadcast re-executes rounds
    // 1..k-1 — measured quadratic blowup. Left lazy, all rounds fuse
    // into ONE job at materialization (each operator runs once) and
    // AQE still broadcasts the measured-small rank side inside it.
    for (_ <- 1 to iters) {
      val contrib = ed
        .join(pr.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst"),
          expr("pr_ppm div outdeg").as("c"))
      // wide: sum and damping-multiply in DECIMAL(38,0) — `div` is
      // integral divide on decimals too (returns BIGINT), so floor
      // semantics match the long path exactly for the non-negative
      // values here
      val agg = contrib.groupBy(col("dst")).agg(
        (if (useWide) sum(col("c").cast("decimal(38,0)"))
         else sum(col("c"))).as("s"))
      val damped =
        if (useWide) expr(
          s"cast(($dampingPpm * coalesce(s, cast(0 as decimal(38,0)))) " +
            s"div $Scale as bigint)")
        else expr(s"($dampingPpm * coalesce(s, 0L)) div $Scale")
      pr = nodes
        .join(agg.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .select(col("node"), (base + damped).as("pr_ppm"))
    }
    pr.select(col("node").as("node_id"), col("pr_ppm"))
      .sanitizedCheckpoint()
  }

  /** Personalized PageRank: restart mass flows to a SEED set instead
    * of uniformly — the "similar to these" primitive of graph
    * recommendation and seed-expansion curation. Same exact ppm
    * fixed-point arithmetic and per-round shape as [[pageRank]]
    * (one equi-join + one map-combined groupBy per round), with the
    * restart base and the initial vector both `(1−d)·[v ∈ S]`-shaped:
    * seeds start at SCALE and keep receiving `SCALE − dampingPpm`
    * per round; non-seeds accumulate only flowed-through mass, so
    * rank concentrates in the seeds' neighborhood (unnormalized —
    * total mass is |S|-proportional, ratios are what callers rank
    * by). The seed table joins once into the node frame (seed flag),
    * adding zero per-round work. Long arithmetic holds to the same
    * ~1.1e7-node bound as the narrow [[pageRank]] path (the hub
    * worst case is identical); past that, widen the same way.
    *
    * @param seeds one column of node ids (same values as `srcCol`) */
  def personalizedPageRank(edges: DataFrame, srcCol: String, dstCol: String,
                           seeds: DataFrame, iters: Int,
                           dampingPpm: Long = 850000L): DataFrame =
    pprRun(edges, srcCol, dstCol, seeds, None, iters, dampingPpm)

  /** WARM-START personalized PageRank — resume the seed-pinned exact
    * ppm iteration from a SAVED vector over the (possibly changed)
    * edge table: [[pageRankResume]]'s discipline with the restart
    * base still pinned to the SEED set (pass the same seeds — the
    * base is part of the map, not of the state). Trajectory-exact
    * like its uniform sibling (and with the same adjacent-fixpoint
    * caveat); nodes the batch introduces seed at the cold init
    * (SCALE for seeds, 0 otherwise). */
  def personalizedPageRankResume(edges: DataFrame, srcCol: String,
                                 dstCol: String, seeds: DataFrame,
                                 savedRanks: DataFrame, iters: Int,
                                 dampingPpm: Long = 850000L): DataFrame =
    pprRun(edges, srcCol, dstCol, seeds, Some(savedRanks), iters,
      dampingPpm)

  /** WEIGHTED personalized PageRank — the rank matrix's last corner
    * (uniform/weighted × global/personalized): mass flows
    * proportionally to edge weight AND restarts onto the seed set.
    * [[pageRankWeighted]]'s exact multiply-before-floor arithmetic
    * with [[personalizedPageRank]]'s seed-pinned base/init; the same
    * node-sized overflow probe widens to DECIMAL(38,0) when
    * n·SCALE·max(w) could wrap (seed mass ≤ total mass, so the
    * uniform bound covers the personalized case). */
  def personalizedPageRankWeighted(edges: DataFrame, srcCol: String,
                                   dstCol: String, wCol: String,
                                   seeds: DataFrame, iters: Int,
                                   dampingPpm: Long = 850000L,
                                   wide: Option[Boolean] = None): DataFrame =
    pprWeightedRun(edges, srcCol, dstCol, wCol, seeds, None, iters,
      dampingPpm, wide)

  /** Warm start for [[personalizedPageRankWeighted]] —
    * [[pageRankWeightedResume]]'s discipline with the restart base
    * pinned to the seed set; weight changes ride for free (W(u), w
    * re-derive per call), absent nodes seed at the cold init. */
  def personalizedPageRankWeightedResume(edges: DataFrame, srcCol: String,
                                         dstCol: String, wCol: String,
                                         seeds: DataFrame,
                                         savedRanks: DataFrame, iters: Int,
                                         dampingPpm: Long = 850000L,
                                         wide: Option[Boolean] = None
                                        ): DataFrame =
    pprWeightedRun(edges, srcCol, dstCol, wCol, seeds, Some(savedRanks),
      iters, dampingPpm, wide)

  private def pprWeightedRun(edges: DataFrame, srcCol: String,
                             dstCol: String, wCol: String,
                             seeds: DataFrame, saved: Option[DataFrame],
                             iters: Int, dampingPpm: Long,
                             wide: Option[Boolean]): DataFrame = {
    require(iters >= 1 && dampingPpm >= 0 && dampingPpm <= Scale)
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
      col(wCol).cast("long").as("w"))
    val wagg = e.groupBy(col("src"))
      .agg(sum(col("w")).as("wsum"), max(col("w")).as("wmax"))
      .persist()
    val nodeCount = wagg.count()
    val ed = e.join(wagg.select(col("src"), col("wsum")), Seq("src"))
      .persist()
    ed.count()
    val seedFlag = seeds.select(col(seeds.columns.head).as("node"))
      .distinct().withColumn("is_seed", lit(true))
    val nodes = wagg.select(col("src").as("node"))
      .join(seedFlag, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("is_seed"), lit(false)).as("is_seed"))
      .persist()
    nodes.count()
    val useWide = wide.getOrElse {
      val maxW = math.max(1L,
        wagg.agg(max(col("wmax"))).head().getLong(0))
      val mult = BigInt(math.max(maxW, dampingPpm)) * Scale
      BigInt(nodeCount) > BigInt(Long.MaxValue) / mult
    }
    wagg.unpersist(blocking = false)
    val base = when(col("is_seed"), lit(Scale - dampingPpm))
      .otherwise(lit(0L))
    val coldInit = when(col("is_seed"), lit(Scale)).otherwise(lit(0L))
    var pr = saved match {
      case None => nodes.select(col("node"), coldInit.as("pr_ppm"))
      case Some(sv) => nodes
        .join(sv.select(col("node_id").as("node"),
          col("pr_ppm").as("saved_pr")), Seq("node"), "left")
        .select(col("node"),
          coalesce(col("saved_pr"), coldInit).as("pr_ppm"))
    }
    for (_ <- 1 to iters) {
      val contrib = ed
        .join(pr.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst"),
          (if (useWide)
             expr("cast((cast(pr_ppm as decimal(38,0)) * w) div wsum " +
               "as bigint)")
           else expr("(pr_ppm * w) div wsum")).as("c"))
      val agg = contrib.groupBy(col("dst")).agg(
        (if (useWide) sum(col("c").cast("decimal(38,0)"))
         else sum(col("c"))).as("s"))
      val damped =
        if (useWide) expr(
          s"cast(($dampingPpm * coalesce(s, cast(0 as decimal(38,0)))) " +
            s"div $Scale as bigint)")
        else expr(s"($dampingPpm * coalesce(s, 0L)) div $Scale")
      pr = nodes
        .join(agg.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .select(col("node"), col("is_seed"), (base + damped).as("pr_ppm"))
    }
    val out = pr.select(col("node").as("node_id"), col("pr_ppm"))
      .sanitizedCheckpoint()
    ed.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    out
  }

  private def pprRun(edges: DataFrame, srcCol: String, dstCol: String,
                     seeds: DataFrame, saved: Option[DataFrame],
                     iters: Int, dampingPpm: Long): DataFrame = {
    require(iters >= 1 && dampingPpm >= 0 && dampingPpm <= Scale)
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val ed = e.join(deg, Seq("src")).persist()
    ed.count()
    val seedFlag = seeds.select(col(seeds.columns.head).as("node"))
      .distinct().withColumn("is_seed", lit(true))
    val nodes = ed.select(col("src").as("node")).distinct()
      .join(seedFlag, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("is_seed"), lit(false)).as("is_seed"))
      .persist()
    nodes.count()
    val base = when(col("is_seed"), lit(Scale - dampingPpm)).otherwise(lit(0L))
    val coldInit = when(col("is_seed"), lit(Scale)).otherwise(lit(0L))
    var pr = saved match {
      case None => nodes.select(col("node"), coldInit.as("pr_ppm"))
      case Some(sv) => nodes
        .join(sv.select(col("node_id").as("node"),
          col("pr_ppm").as("saved_pr")), Seq("node"), "left")
        .select(col("node"),
          coalesce(col("saved_pr"), coldInit).as("pr_ppm"))
    }
    for (_ <- 1 to iters) {
      val contrib = ed
        .join(pr.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst"), expr("pr_ppm div outdeg").as("c"))
      val agg = contrib.groupBy(col("dst")).agg(sum(col("c")).as("s"))
      pr = nodes
        .join(agg.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .select(col("node"), col("is_seed"),
          (base + expr(s"($dampingPpm * coalesce(s, 0L)) div $Scale"))
            .as("pr_ppm"))
    }
    val out = pr.select(col("node").as("node_id"), col("pr_ppm"))
      .sanitizedCheckpoint()
    ed.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    out
  }
}
