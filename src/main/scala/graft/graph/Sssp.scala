package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Converge.SanitizedCheckpoint

/** Multi-source BFS distances (unweighted single/multi-source
  * shortest paths) — the frontier-expansion member of the iterative
  * graph family, and the substrate for graph-radius curation metrics
  * and seed-expansion audits next to PPR.
  *
  * Shape: classic level-synchronous BFS. The distance table starts as
  * the source set at distance 0; each round expands the FRONTIER
  * (nodes first reached last round) through one equi-join against the
  * edge table, then anti-joins the running distance table so only
  * never-seen nodes enter — for unweighted edges a node's first reach
  * IS its final distance, so no relaxation or min-agg over prior
  * rounds is needed. Per round: one equi-join (frontier × edges,
  * partitioned by the join key) + one dedup partial-agg + one
  * anti-join against O(reached) state. The frontier is materialized
  * per round via [[graft.operators.Converge.checkpointWithSig]] — the
  * driver sees two longs (count, hash), never node data, and the
  * empty-frontier test doubles as the convergence signal in the same
  * job that truncates lineage.
  *
  * Early termination equals the full `maxHops` unroll: an empty
  * frontier means no further round could add a node, so the output is
  * EXACTLY "every node reachable within maxHops hops, at its true hop
  * distance" regardless of where the loop stopped — which is what
  * lets a fixed-round DuckDB oracle (the q_pagerank/q_kcore unrolled
  * pattern) hash-match the adaptive loop at any scale.
  *
  * Scale: state is O(reached nodes), per-round shuffle is
  * O(frontier-incident edges) — strictly less than PageRank's
  * all-edges rounds; a hub's out-edges concentrate on its partition
  * exactly like any per-node neighborhood aggregate. The result is a
  * union of ≤ maxHops checkpointed per-round frames (each leaf
  * materialized, no recompute risk). Rounds are diameter-bounded and
  * `maxHops`-capped, so the loop cannot run away on an adversarial
  * graph.
  *
  * Edges are taken as DIRECTED (src → dst); callers wanting
  * undirected reach symmetrize first, as q_pagerank's graph does.
  * Every source row appears in the output at distance 0 even if
  * isolated — sources define the seed set, not the graph.
  */
object Sssp {

  /** Hop distances from a source set over a directed edge list.
    *
    * @param edges   directed edges
    * @param sources seed nodes (deduplicated; all emitted at dist 0)
    * @param maxHops inclusive hop cap; nodes farther than this (or
    *                unreachable) are omitted from the output
    * @return (node_id, dist) — exact integer hop counts
    */
  def bfsDistances(edges: DataFrame, srcCol: String, dstCol: String,
                   sources: DataFrame, sourceCol: String,
                   maxHops: Int): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    val e = edges.select(col(srcCol).as("node"), col(dstCol).as("nxt"))
      .persist()
    e.count() // materialize once; every round joins against it

    val seed = sources.select(col(sourceCol).as("node")).distinct()
      .withColumn("dist", lit(0L))
    var (frontier, (nFrontier, _)) =
      graft.operators.Converge.checkpointWithSig(seed, "node")
    // distance table = union of materialized per-round frontiers;
    // each leg is a checkpointed RDD, so the growing union is a
    // read-only scan list, not a growing lineage
    var dist = frontier
    var hop = 0
    // One hop per checkpoint, DELIBERATELY: fusing two hops into one
    // materializing job (the SCC color/mark trick) was tried in r14
    // and measured SLOWER (q_sssp 3.7 → 5.5+ s at sf0.1). Inside one
    // job the second layer's lazy plan references the first layer
    // three times (the union leg, its expansion source, and its
    // anti-join guard) with nothing materialized in between, so the
    // first layer's join+distinct+anti-join re-evaluates per
    // reference — recompute costs more than the scheduler round-trip
    // the fusion saves. SCC can fuse because its half-steps are
    // single-reference; BFS layers are not. (BASELINE.md r14
    // adjudication.)
    while (nFrontier > 0 && hop < maxHops) {
      hop += 1
      val expanded = frontier.join(e, "node")
        .select(col("nxt").as("node")).distinct()
        .join(dist, Seq("node"), "left_anti")
        .withColumn("dist", lit(hop.toLong))
      val (next, (n, _)) =
        graft.operators.Converge.checkpointWithSig(expanded, "node")
      frontier = next
      nFrontier = n
      if (n > 0) dist = dist.unionByName(frontier)
    }
    val out = dist.select(col("node").as("node_id"), col("dist"))
    e.unpersist()
    out
  }

  /** PER-SOURCE hop distances — the pivot-sampled centrality
    * substrate (Eppstein–Wang, "Fast approximation of centrality",
    * J. Graph Algorithms Appl. 8(1), 2004): where [[bfsDistances]]
    * collapses the seed set to each node's NEAREST source, this keeps
    * the (source, node) pair, running all k pivots' BFS layers in the
    * same level-synchronous rounds — one equi-join per round over a
    * frontier of tagged pairs, never k sequential sweeps.
    *
    * Scale: state is O(k · reached) rows and the per-round shuffle is
    * O(k · frontier-incident edges) — k is the SAMPLE size (a fixed
    * constant: centrality error decays as 1/√k, so k ≈ 64–256 serves
    * any corpus), so the pair state is a constant factor over plain
    * BFS, not a V² all-pairs table. One hop per checkpoint, like
    * [[bfsDistances]] (see the fusion negative result there), with
    * the anti-join and frontier keys widened to the (src, node) pair.
    *
    * @return (src_id, node_id, dist): every source at dist 0 to
    *         itself, every (pivot, node) pair within maxHops */
  def bfsDistancesPerSource(edges: DataFrame, srcCol: String,
                            dstCol: String, sources: DataFrame,
                            sourceCol: String, maxHops: Int): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    val e = edges.select(col(srcCol).as("node"), col(dstCol).as("nxt"))
      .persist()
    e.count()
    val seed = sources.select(col(sourceCol).as("src")).distinct()
      .select(col("src"), col("src").as("node"), lit(0L).as("dist"))
    var (frontier, (nFrontier, _)) =
      graft.operators.Converge.checkpointWithSig(seed, "src, node")
    var dist = frontier
    var hop = 0
    while (nFrontier > 0 && hop < maxHops) {
      hop += 1
      val expanded = frontier.select(col("src"), col("node")).join(e, "node")
        .select(col("src"), col("nxt").as("node")).distinct()
        .join(dist, Seq("src", "node"), "left_anti")
        .withColumn("dist", lit(hop.toLong))
      val (next, (n, _)) =
        graft.operators.Converge.checkpointWithSig(expanded, "src, node")
      frontier = next
      nFrontier = n
      if (n > 0) dist = dist.unionByName(frontier)
    }
    val out = dist.select(col("src").as("src_id"),
      col("node").as("node_id"), col("dist"))
    e.unpersist()
    out
  }

  /** BIT-PARALLEL pivot centrality — the mask-word fast path over
    * [[bfsDistancesPerSource]]'s semantics: the set of pivots that
    * have reached a node rides as ⌈k/64⌉ 64-bit MASK WORD columns
    * per node, so all k BFS sweeps collapse into a single BFS-cost
    * loop — per hop one equi-join (edges ⋈ changed masks) + a
    * per-word `bit_or` partial-agg + one V-row merge, costing the
    * word count (a row-width constant), never k sweeps. Centrality
    * accumulators update incrementally: bits newly set at hop h are
    * pivots whose distance IS h (first reach = min dist),
    * contributing `Σ_w popcount(newly_w)` to the reach count,
    * `popcount·h` to Σd, and `popcount·(10⁶ div h)` to the harmonic
    * sum — exactly the per-pair reductions of the tagged form,
    * bit-for-bit (the oracle replays the per-pair unroll). A pivot's
    * own bit is set at init, which both anchors the sweep and
    * suppresses d>0 self-re-reach, matching min-dist semantics.
    * Delta propagation: a node whose mask didn't change last hop
    * contributes exactly what it already contributed, so only
    * changed masks join — and an empty change set ends the loop
    * early, equal to the full unroll.
    *
    * Scale: state is ONE row per reached node (⌈k/64⌉ mask longs +
    * three accumulator longs); per-hop shuffle is
    * O(frontier-incident edges · row width) — where the tagged form
    * pays k separate sweeps (measured near-linear in k: 405→64→16
    * pivots cost 57→33→14 s at sf0.1; this shape at k=64 costs BFS
    * money, 6.3 s). Production pivot counts are 256–1024 (error
    * decays as 1/√k): k=1024 is 16 mask words ≈ 128 bytes/node of
    * state — still a row-width constant, not a sweep multiplier.
    *
    * @return (node_id, n_pivots, harmonic_ppm, closeness_ppm) for
    *         every node reached by ≥ 1 pivot at dist > 0 */
  def pivotCentralityBitset(edges: DataFrame, srcCol: String,
                            dstCol: String, pivots: DataFrame,
                            pivotCol: String, maxHops: Int): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    val e = edges.select(col(srcCol).as("node"), col(dstCol).as("nxt"))
      .persist()
    e.count()
    // deterministic bit assignment: pivots ranked by id (the caller
    // already picked WHICH pivots; bit order only needs determinism)
    val ranked = pivots.select(col(pivotCol).as("node")).distinct()
      .withColumn("i", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("node"))) - 1)
    val k = ranked.count() // control-plane scalar, k ≤ 1024 by contract
    require(k >= 1 && k <= 1024,
      s"bitset centrality needs 1..1024 pivots, got $k")
    val nw = ((k + 63) / 64).toInt // mask words
    val ws = 0 until nw
    def maskCols = ws.map(w => col(s"m$w"))
    val maskSig = ws.map(w => s"m$w").mkString(", ")
    // pivot i owns bit (i % 64) of word (i div 64)
    val init = ranked.select(col("node") +: (ws.map { w =>
      when(expr("i div 64") === w,
        expr("shiftleft(1L, cast(i % 64 as int))"))
        .otherwise(lit(0L)).as(s"m$w")
    } ++ Seq(lit(0L).as("np"), lit(0L).as("sd"), lit(0L).as("hp"))): _*)
    var (state, _) = graft.operators.Converge.checkpointWithSig(
      init, s"node, $maskSig, np, sd, hp")
    var frontier = state.select(col("node") +: maskCols: _*)
    var nFrontier = k
    var hop = 0
    while (nFrontier > 0 && hop < maxHops) {
      hop += 1
      val hw = 1000000L / hop // the exact-ppm harmonic term at this hop
      val cand = e.join(frontier, Seq("node"))
        .groupBy(col("nxt"))
        .agg(expr("bit_or(m0)").as("c0"),
          ws.drop(1).map(w => expr(s"bit_or(m$w)").as(s"c$w")): _*)
        .withColumnRenamed("nxt", "node")
      val bits = ws.map(w => s"bit_count(n$w)").mkString(" + ")
      val updated = state.join(cand, Seq("node"), "full_outer")
        .select(col("node") +: (ws.flatMap(w => Seq(
            coalesce(col(s"m$w"), lit(0L)).as(s"o$w"),
            coalesce(col(s"c$w"), lit(0L)).as(s"c$w"))) ++ Seq(
          coalesce(col("np"), lit(0L)).as("np"),
          coalesce(col("sd"), lit(0L)).as("sd"),
          coalesce(col("hp"), lit(0L)).as("hp"))): _*)
        .select(col("node") +: (
          ws.map(w => expr(s"c$w & ~o$w").as(s"n$w")) ++
            ws.map(w => col(s"o$w")) ++
            Seq(col("np"), col("sd"), col("hp"))): _*)
        .select(col("node") +: (
          ws.map(w => expr(s"o$w | n$w").as(s"m$w")) ++ Seq(
            expr(s"np + $bits").as("np"),
            expr(s"sd + ($bits) * ${hop}L").as("sd"),
            expr(s"hp + ($bits) * ${hw}L").as("hp")) ++
            ws.map(w => col(s"n$w"))): _*)
      // checkpoint ONCE (updated is referenced by both the next state
      // and the frontier — two lazy references would re-run the
      // full-outer join per reference, the r14 fusion lesson); the
      // frontier is then a filter over the checkpointed rows and its
      // count one tiny job on materialized data
      val newlySig = ws.map(w => s"n$w").mkString(", ")
      val (next, _) = graft.operators.Converge.checkpointWithSig(
        updated, s"node, $maskSig, np, sd, hp, $newlySig")
      state = next
      frontier = next
        .where(ws.map(w => col(s"n$w") =!= 0).reduce(_ || _))
        .select(col("node") +: maskCols: _*)
      nFrontier = frontier.count()
    }
    val out = state.where(col("np") > 0)
      .select(col("node").as("node_id"), col("np").as("n_pivots"),
        col("hp").as("harmonic_ppm"),
        expr("np * 1000000 div sd").as("closeness_ppm"))
    e.unpersist()
    out
  }

  /** Incremental BFS maintenance — the saved-index pattern
    * (`minHashIndex`/`srpIndex`/`semDedupIndex`) applied to distances:
    * given a SAVED distance table from a prior [[bfsDistances]] run
    * and a batch of NEW edges, recompute only what the batch can
    * change instead of re-running BFS over the whole graph.
    *
    * Edge inserts only ever SHRINK hop distances, so the saved table
    * is a valid over-approximation: seed the repair frontier with the
    * new edges' improvements (`dist(u)+1 < dist(v)` or v unreached),
    * then propagate improvements over the UNION graph with the same
    * one-equi-join-per-round shape — each round relaxes only the
    * improved frontier, so per-batch cost is proportional to the
    * region the batch actually changes, never the corpus. The result
    * is row-identical to a full [[bfsDistances]] over old ∪ new edges
    * at the same `maxHops` (the equivalence the oracle and spec gate).
    *
    * Unlike [[bfsDistances]]' frontier (first reach = final), a
    * repair frontier node carries a DIST that may itself be improved
    * by a later round, so rounds detect improvement against the
    * running table (the weighted loop's min semantics at weight 1);
    * rounds are bounded by maxHops + the batch's improvement depth.
    */
  def bfsDistancesIncremental(edges: DataFrame, newEdges: DataFrame,
                              srcCol: String, dstCol: String,
                              savedDist: DataFrame,
                              maxHops: Int): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    val e = edges.select(col(srcCol).as("node"), col(dstCol).as("nxt"))
      .unionByName(
        newEdges.select(col(srcCol).as("node"), col(dstCol).as("nxt")))
      .persist()
    e.count()
    val (dist0, _) = graft.operators.Converge.checkpointWithSig(
      savedDist.select(col("node_id").as("node"), col("dist")), "node, dist")
    // repair seeds: improvements the new edges create directly
    val seed0 = newEdges
      .select(col(srcCol).as("node"), col(dstCol).as("v"))
      .join(dist0, Seq("node"))
      .select(col("v").as("node"), (col("dist") + lit(1L)).as("dist"))
      .where(col("dist") <= maxHops)
      .groupBy(col("node")).agg(min(col("dist")).as("dist"))
      .join(dist0.select(col("node"), col("dist").as("old")),
        Seq("node"), "left")
      .where(col("old").isNull || col("dist") < col("old"))
      .select(col("node"), col("dist"))
    // r18 optimization (one job per round, the HyperBall-fold shape):
    // the round's merged table and its improvement frontier ride ONE
    // checkpoint — state = min-fold of (table, candidates) with an
    // `imp` flag on rows a candidate improved; the next frontier is a
    // filter over the checkpointed rows, its size collected by the
    // same job's observation. Round-for-round the folded values and
    // frontier sets are exactly the old two-checkpoint form's (min is
    // confluent, flags replay the same strict-improvement test), so
    // the fixpoint — and the equivalence gate — are unchanged.
    var (state, _, nFrontier) = graft.operators.Converge
      .checkpointWithSigCount(
        dist0.select(col("node"), col("dist"), lit(false).as("imp"))
          .unionByName(seed0.select(col("node"), col("dist"),
            lit(true).as("imp")))
          .groupBy(col("node"))
          .agg(min(col("dist")).as("dist"), max(col("imp")).as("imp")),
        "node, dist", "imp")
    var guard = 0
    while (nFrontier > 0) {
      guard += 1
      require(guard <= maxHops + 1,
        s"incremental repair exceeded ${maxHops + 1} rounds")
      val frontier = state.where(col("imp"))
        .select(col("node"), col("dist"))
      val cand = frontier.join(e, "node")
        .select(col("nxt").as("node"), (col("dist") + lit(1L)).as("dist"))
        .where(col("dist") <= maxHops)
        .groupBy(col("node")).agg(min(col("dist")).as("cand"))
      val merged = state.select(col("node"), col("dist"))
        .join(cand, Seq("node"), "full_outer")
        .select(col("node"),
          least(col("dist"), col("cand")).as("dist"),
          (col("dist").isNull ||
            (col("cand").isNotNull && col("cand") < col("dist")))
            .as("imp"))
      val (next, _, n) = graft.operators.Converge
        .checkpointWithSigCount(merged, "node, dist", "imp")
      state = next
      nFrontier = n
    }
    val out = state.select(col("node").as("node_id"), col("dist"))
    e.unpersist()
    out
  }

  /** Edge-DELETE maintenance for BFS distances — the missing half of
    * the incremental family: [[bfsDistancesIncremental]] handles
    * inserts (distances only shrink, so the saved table is a sound
    * over-approximation to improve); deletions can only GROW
    * distances, which breaks that invariant — what a takedown /
    * opt-out pipeline needs at the graph layer is the inverse repair.
    *
    * Three phases, each bounded by the region the batch can actually
    * touch (the DRed over-delete/re-derive discipline from
    * incremental Datalog view maintenance):
    *
    *  1. INVALIDATE — mark every node whose saved distance might
    *     depend on a deleted edge: seed with heads of TIGHT deleted
    *     edges (d(v) = d(u) + 1 — a non-tight edge was on no shortest
    *     path and deleting it changes nothing), then propagate along
    *     tight surviving edges (d(w) = d(x) + 1 with x marked). This
    *     over-approximates: a marked node may still have an untouched
    *     shortest path (the re-derive phase rediscovers it). An
    *     UNMARKED node provably keeps its distance: by induction on
    *     d, every one of its tight in-edges survives with an unmarked
    *     tail — and sources (d = 0) can never be marked.
    *  2. RETRACT — drop the marked rows; the unaffected remainder is
    *     exact for the pruned graph.
    *  3. RE-DERIVE — min-relax distances back INTO the marked region
    *     only, seeded from the unaffected boundary, over the pruned
    *     graph: per round one equi-join of the improved frontier
    *     against the edges, candidates filtered to marked targets. A
    *     marked node that no surviving path reaches within the cap
    *     drops out — exactly the full recompute's behavior.
    *
    * Per-batch cost tracks the invalidation region (its incident
    * edges, for both the sweep and the repair), never the corpus —
    * deleting a non-bridge edge in a big graph touches a few rows.
    * The result is row-identical to a full [[bfsDistances]] over
    * `edges` minus `deletedEdges` at the same `maxHops` (the
    * equivalence the oracle and spec gate).
    *
    * @param edges        the ORIGINAL directed edge set the saved
    *                     table was computed over
    * @param deletedEdges the batch to remove (a row not present in
    *                     `edges` prunes nothing; at worst it
    *                     over-marks, which the re-derive repairs)
    * @param savedDist    (node_id, dist) from [[bfsDistances]] over
    *                     `edges` at the SAME maxHops
    */
  def bfsDistancesDeleted(edges: DataFrame, deletedEdges: DataFrame,
                          srcCol: String, dstCol: String,
                          savedDist: DataFrame,
                          maxHops: Int): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    val eAll = edges.select(col(srcCol).as("node"), col(dstCol).as("nxt"))
      .distinct()
    val del = deletedEdges
      .select(col(srcCol).as("node"), col(dstCol).as("nxt")).distinct()
    val e = eAll.join(del, Seq("node", "nxt"), "left_anti").persist()
    e.count()
    val (dist0, _) = graft.operators.Converge.checkpointWithSig(
      savedDist.select(col("node_id").as("node"), col("dist")),
      "node, dist")
    // 1. INVALIDATE: tight deleted edges seed the marked set.
    // r18 optimization (one job per round, the HyperBall-fold shape):
    // the marked set carries a `nw` flag on the rows the round added —
    // the next sweep frontier is a filter over the checkpointed rows
    // (old form: checkpoint the tight frontier AND re-checkpoint the
    // grown marked union — two jobs). Membership and dists are
    // unchanged: a tight candidate for an already-marked node carries
    // the same dist0 value, so the full-outer coalesce is a no-op on
    // overlaps and `nw` replays the old anti-join exactly.
    val seedA = del
      .join(dist0.select(col("node"), col("dist").as("d_src")), Seq("node"))
      .select(col("nxt").as("node"), (col("d_src") + lit(1L)).as("dist"))
      .join(dist0, Seq("node", "dist")) // tight: d(v) = d(u) + 1
      .select(col("node"), col("dist")).distinct()
    var (mstate, _, nFrontA) = graft.operators.Converge
      .checkpointWithSigCount(
        seedA.select(col("node"), col("dist"), lit(true).as("nw")),
        "node, dist", "nw")
    var guard = 0
    while (nFrontA > 0) {
      guard += 1
      require(guard <= maxHops + 1,
        s"invalidation sweep exceeded ${maxHops + 1} rounds")
      val frontA = mstate.where(col("nw")).select(col("node"), col("dist"))
      val tight = frontA.join(e, Seq("node"))
        .select(col("nxt").as("node"), (col("dist") + lit(1L)).as("dist"))
        .join(dist0, Seq("node", "dist")) // d(w) = d(x) + 1
        .select(col("node"), col("dist").as("cd")).distinct()
      val merged = mstate.select(col("node"), col("dist"))
        .join(tight, Seq("node"), "full_outer")
        .select(col("node"), coalesce(col("dist"), col("cd")).as("dist"),
          col("dist").isNull.as("nw"))
      val (next, _, n) = graft.operators.Converge
        .checkpointWithSigCount(merged, "node, dist", "nw")
      mstate = next
      nFrontA = n
    }
    val markedIds = mstate.select(col("node"))
    // 2. RETRACT: the unaffected remainder is exact for the pruned
    // graph (sources are never marked, so the seed set survives)
    val keep = dist0.join(markedIds, Seq("node"), "left_anti")
      .sanitizedCheckpoint()
    // 3. RE-DERIVE: seed the repair from the unaffected boundary,
    // then min-relax within the marked region only
    // r18 optimization: the repair table and its improvement frontier
    // ride one checkpoint per round (the bfsDistancesIncremental fold
    // — identical per-round values/frontiers, min confluence keeps
    // the fixpoint byte-identical).
    val seedB = keep.join(e, Seq("node"))
      .select(col("nxt").as("node"), (col("dist") + lit(1L)).as("dist"))
      .where(col("dist") <= maxHops)
      .join(markedIds, Seq("node"))
      .groupBy(col("node")).agg(min(col("dist")).as("dist"))
    var (bstate, _, nFront) = graft.operators.Converge
      .checkpointWithSigCount(
        seedB.select(col("node"), col("dist"), lit(true).as("imp")),
        "node, dist", "imp")
    guard = 0
    while (nFront > 0) {
      guard += 1
      require(guard <= maxHops + 1,
        s"delete repair exceeded ${maxHops + 1} rounds")
      val front = bstate.where(col("imp")).select(col("node"), col("dist"))
      val cand = front.join(e, Seq("node"))
        .select(col("nxt").as("node"), (col("dist") + lit(1L)).as("dist"))
        .where(col("dist") <= maxHops)
        .join(markedIds, Seq("node"))
        .groupBy(col("node")).agg(min(col("dist")).as("cand"))
      val merged = bstate.select(col("node"), col("dist"))
        .join(cand, Seq("node"), "full_outer")
        .select(col("node"),
          least(col("dist"), col("cand")).as("dist"),
          (col("dist").isNull ||
            (col("cand").isNotNull && col("cand") < col("dist")))
            .as("imp"))
      val (next, _, n) = graft.operators.Converge
        .checkpointWithSigCount(merged, "node, dist", "imp")
      bstate = next
      nFront = n
    }
    val out = keep.unionByName(bstate.select(col("node"), col("dist")))
      .select(col("node").as("node_id"), col("dist"))
    e.unpersist()
    out
  }

  /** Edge-DELETE maintenance for WEIGHTED shortest paths —
    * [[bfsDistancesDeleted]]'s weighted twin, completing the
    * incremental family's delete half (insert/delete × unweighted/
    * weighted): given a SAVED CONVERGED distance table from
    * [[weightedDistances]] over `edges` and a batch of LINKS to
    * retract, repair only the region whose distances depended on a
    * deleted link — the DRed over-delete/re-derive discipline with
    * weighted tightness (d(v) = d(u) + w).
    *
    * Deletion is at the LINK (node-pair) level — the takedown/opt-out
    * shape retracts a relationship, so every parallel edge between
    * the pair goes; a batch pair not present in `edges` prunes
    * nothing (at worst it over-marks, which the re-derive repairs).
    *
    *  1. INVALIDATE — seed with heads of TIGHT deleted edges
    *     (d(v) = d(u) + w using the ORIGINAL edges' weights on the
    *     deleted pairs; a non-tight edge was on no shortest path),
    *     propagate along tight SURVIVING edges. The unmarked-keeps-
    *     its-distance induction runs on strictly increasing distance
    *     along tight edges, which is what the POSITIVE-weight
    *     contract buys (w ≥ 1 — with zero weights a tight cycle, or
    *     a tight edge into a source, breaks it; enforced with one
    *     scalar aggregate over the already-persisted edge frame).
    *  2. RETRACT the marked rows; the remainder is exact for the
    *     pruned graph (sources are never marked: a tight candidate
    *     carries dist ≥ 1, a source row carries 0).
    *  3. RE-DERIVE — min-relax INTO the marked region only, seeded
    *     from the unaffected boundary, over the pruned graph, to the
    *     empty-frontier fixpoint (min-relaxation is confluent, so the
    *     fixpoint equals the full recompute; a marked node no
    *     surviving path reaches drops out).
    *
    * Per-batch cost tracks the invalidation region and its incident
    * edges, never the corpus. The result is row-identical to a full
    * CONVERGED [[weightedDistances]] over `edges` minus the deleted
    * pairs — the equivalence the oracle and spec gate.
    *
    * @param savedDist (node_id, dist) from a CONVERGED
    *                  [[weightedDistances]] over `edges` (a
    *                  round-capped table breaks the phase-2 exactness
    *                  the same way it breaks the insert repair)
    * @param maxRounds runaway guard on the sweep and repair loops
    *                  (the affected region's relaxation depth);
    *                  breaching it throws rather than truncating
    */
  def weightedDistancesDeleted(edges: DataFrame, deletedEdges: DataFrame,
                               srcCol: String, dstCol: String,
                               weightCol: String, savedDist: DataFrame,
                               maxRounds: Int): DataFrame = {
    require(maxRounds >= 0, s"maxRounds must be >= 0, got $maxRounds")
    val eAll = edges.select(col(srcCol).as("node"), col(dstCol).as("nxt"),
        col(weightCol).cast("long").as("w"))
      .distinct()
    val delPairs = deletedEdges
      .select(col(srcCol).as("node"), col(dstCol).as("nxt")).distinct()
    // the retracted rows AS THEY EXIST in the graph (original
    // weights) — what the tight-seed test must run against
    val delFull = eAll.join(delPairs, Seq("node", "nxt"), "left_semi")
      .persist()
    val e = eAll.join(delPairs, Seq("node", "nxt"), "left_anti").persist()
    // try/finally: the weight-contract require and the per-loop round
    // guards THROW — without the finally both frames stay cached for
    // the session on those paths (the normal exit unpersists the same
    // two, so the finally is the only change)
    try {
      e.count()
      val minW = eAll.agg(min(col("w"))).head()
      require(minW.isNullAt(0) || minW.getLong(0) >= 1L,
        s"weighted delete repair requires positive weights, " +
          s"found min w = ${minW.getLong(0)}")
      val (dist0, _) = graft.operators.Converge.checkpointWithSig(
        savedDist.select(col("node_id").as("node"), col("dist")),
        "node, dist")
      // 1. INVALIDATE: heads of tight deleted edges seed the marked
      // set. r18 optimization: one checkpoint per sweep round — the
      // marked table carries a `nw` flag on the round's additions and
      // the next frontier is a filter over the checkpointed rows
      // (see bfsDistancesDeleted; membership and dists unchanged).
      val seedA = delFull
        .join(dist0.select(col("node"), col("dist").as("d_src")), Seq("node"))
        .select(col("nxt").as("node"), (col("d_src") + col("w")).as("dist"))
        .join(dist0, Seq("node", "dist")) // tight: d(v) = d(u) + w
        .select(col("node"), col("dist")).distinct()
      var (mstate, _, nFrontA) = graft.operators.Converge
        .checkpointWithSigCount(
          seedA.select(col("node"), col("dist"), lit(true).as("nw")),
          "node, dist", "nw")
      var guard = 0
      while (nFrontA > 0) {
        guard += 1
        require(guard <= maxRounds,
          s"invalidation sweep exceeded $maxRounds rounds")
        val frontA = mstate.where(col("nw")).select(col("node"), col("dist"))
        val tight = frontA.join(e, Seq("node"))
          .select(col("nxt").as("node"), (col("dist") + col("w")).as("dist"))
          .join(dist0, Seq("node", "dist")) // d(x) = d(v) + w
          .select(col("node"), col("dist").as("cd")).distinct()
        val merged = mstate.select(col("node"), col("dist"))
          .join(tight, Seq("node"), "full_outer")
          .select(col("node"), coalesce(col("dist"), col("cd")).as("dist"),
            col("dist").isNull.as("nw"))
        val (next, _, n) = graft.operators.Converge
          .checkpointWithSigCount(merged, "node, dist", "nw")
        mstate = next
        nFrontA = n
      }
      val markedIds = mstate.select(col("node"))
      // 2. RETRACT: the unaffected remainder is exact for the pruned graph
      val keep = dist0.join(markedIds, Seq("node"), "left_anti")
        .sanitizedCheckpoint()
      // 3. RE-DERIVE: min-relax the marked region from the unaffected
      // boundary over the pruned graph, to the empty-frontier fixpoint
      // r18 optimization: one checkpoint per repair round (the
      // bfsDistancesIncremental fold — identical per-round values and
      // frontiers, min confluence keeps the fixpoint byte-identical).
      val seedB = keep.join(e, Seq("node"))
        .select(col("nxt").as("node"), (col("dist") + col("w")).as("dist"))
        .join(markedIds, Seq("node"))
        .groupBy(col("node")).agg(min(col("dist")).as("dist"))
      var (bstate, _, nFront) = graft.operators.Converge
        .checkpointWithSigCount(
          seedB.select(col("node"), col("dist"), lit(true).as("imp")),
          "node, dist", "imp")
      guard = 0
      while (nFront > 0) {
        guard += 1
        require(guard <= maxRounds,
          s"delete repair exceeded $maxRounds rounds")
        val front = bstate.where(col("imp")).select(col("node"), col("dist"))
        val cand = front.join(e, Seq("node"))
          .select(col("nxt").as("node"), (col("dist") + col("w")).as("dist"))
          .join(markedIds, Seq("node"))
          .groupBy(col("node")).agg(min(col("dist")).as("cand"))
        val merged = bstate.select(col("node"), col("dist"))
          .join(cand, Seq("node"), "full_outer")
          .select(col("node"),
            least(col("dist"), col("cand")).as("dist"),
            (col("dist").isNull ||
              (col("cand").isNotNull && col("cand") < col("dist")))
              .as("imp"))
        val (next, _, n) = graft.operators.Converge
          .checkpointWithSigCount(merged, "node, dist", "imp")
        bstate = next
        nFront = n
      }
      keep.unionByName(bstate.select(col("node"), col("dist")))
        .select(col("node").as("node_id"), col("dist"))
    } finally { delFull.unpersist(); e.unpersist() }
  }

  /** Incremental WEIGHTED shortest-path maintenance —
    * [[bfsDistancesIncremental]]'s weighted twin, same saved-index
    * idiom: given a SAVED distance table from a CONVERGED
    * [[weightedDistances]] run and a batch of NEW edges, repair only
    * the region the batch improves instead of re-relaxing the whole
    * graph.
    *
    * Correctness rests on NONNEGATIVE weights: edge inserts then only
    * ever SHRINK shortest-path distances, so the converged saved table
    * is a valid over-approximation of the union graph's distances.
    * Seed the repair with the new edges' direct improvements
    * (`dist(u) + w < dist(v)`, or v unreached), then propagate
    * improvements over the UNION graph — per round one equi-join of
    * the improved frontier against the edges + a min partial-agg, so
    * per-batch cost tracks the improvement region, never the corpus.
    * At the empty-frontier fixpoint the table IS the converged
    * full-graph result (min-relaxation is confluent: improvements
    * commute, and any still-improvable node would still be on the
    * frontier) — the equivalence the oracle and spec gate.
    *
    * A saved table that is NOT converged (e.g. a round-capped
    * [[weightedDistances]] run that stopped before its fixpoint)
    * breaks the over-approximation contract the same way a stale
    * artifact would — the caller owns convergence, which
    * [[weightedDistances]]' signature-confirmed early stop provides
    * whenever `maxRounds` clears the graph's relaxation depth.
    *
    * @param maxRounds runaway guard on REPAIR rounds (the improvement
    *                  region's relaxation depth, not the hop cap);
    *                  breaching it throws rather than truncating
    */
  def weightedDistancesIncremental(edges: DataFrame, newEdges: DataFrame,
                                   srcCol: String, dstCol: String,
                                   weightCol: String,
                                   savedDist: DataFrame,
                                   maxRounds: Int): DataFrame = {
    require(maxRounds >= 0, s"maxRounds must be >= 0, got $maxRounds")
    def shaped(df: DataFrame) =
      df.select(col(srcCol).as("node"), col(dstCol).as("nxt"),
        col(weightCol).cast("long").as("w"))
    val e = shaped(edges).unionByName(shaped(newEdges)).persist()
    e.count()
    val (dist0, _) = graft.operators.Converge.checkpointWithSig(
      savedDist.select(col("node_id").as("node"), col("dist")), "node, dist")
    // repair seeds: improvements the new edges create directly
    val seed0 = shaped(newEdges)
      .join(dist0, Seq("node"))
      .select(col("nxt").as("node"), (col("dist") + col("w")).as("dist"))
      .groupBy(col("node")).agg(min(col("dist")).as("dist"))
      .join(dist0.select(col("node"), col("dist").as("old")),
        Seq("node"), "left")
      .where(col("old").isNull || col("dist") < col("old"))
      .select(col("node"), col("dist"))
    // r18 optimization: one checkpoint per round — the min-folded
    // table carries an `imp` flag and the frontier is a filter over
    // the checkpointed rows (see bfsDistancesIncremental; identical
    // per-round values and frontier sets, min-relaxation confluence
    // unchanged, so the converged fixpoint is byte-identical).
    var (state, _, nFrontier) = graft.operators.Converge
      .checkpointWithSigCount(
        dist0.select(col("node"), col("dist"), lit(false).as("imp"))
          .unionByName(seed0.select(col("node"), col("dist"),
            lit(true).as("imp")))
          .groupBy(col("node"))
          .agg(min(col("dist")).as("dist"), max(col("imp")).as("imp")),
        "node, dist", "imp")
    var guard = 0
    while (nFrontier > 0) {
      guard += 1
      require(guard <= maxRounds,
        s"incremental weighted repair exceeded $maxRounds rounds")
      val frontier = state.where(col("imp"))
        .select(col("node"), col("dist"))
      val cand = frontier.join(e, "node")
        .select(col("nxt").as("node"), (col("dist") + col("w")).as("dist"))
        .groupBy(col("node")).agg(min(col("dist")).as("cand"))
      val merged = state.select(col("node"), col("dist"))
        .join(cand, Seq("node"), "full_outer")
        .select(col("node"),
          least(col("dist"), col("cand")).as("dist"),
          (col("dist").isNull ||
            (col("cand").isNotNull && col("cand") < col("dist")))
            .as("imp"))
      val (next, _, n) = graft.operators.Converge
        .checkpointWithSigCount(merged, "node, dist", "imp")
      state = next
      nFrontier = n
    }
    val out = state.select(col("node").as("node_id"), col("dist"))
    e.unpersist()
    out
  }

  /** Integer-WEIGHTED shortest paths (distributed Bellman-Ford),
    * bounded rounds: after round k the distance table holds the exact
    * min-cost walk using ≤ k edges from the nearest source — so a
    * fixed `maxRounds` unrolls in the oracle like the BFS hop cap,
    * and the signature-detected early stop (no distance changed ⇒ no
    * later round can change one either, relaxation being a pure
    * function of the table) equals the full unroll.
    *
    * Where [[bfsDistances]] expands only the frontier (first reach is
    * final for unweighted edges), weighted relaxation can IMPROVE an
    * already-reached node, so each round relaxes the full distance
    * table: one equi-join (dist × edges, partitioned by the join key)
    * + one min partial-agg — the PageRank communication pattern,
    * O(reached-incident edges) shuffle per round. State stays
    * O(reached nodes); rounds are capped, so an adversarial graph
    * cannot run the loop away. Convergence detection rides each
    * round's checkpoint via [[graft.operators.Converge]].
    *
    * Weights are cast to long; intended nonnegative (a negative
    * weight keeps the ≤ k-edge semantics but makes "shortest path"
    * depend on maxRounds under negative cycles).
    */
  def weightedDistances(edges: DataFrame, srcCol: String, dstCol: String,
                        weightCol: String,
                        sources: DataFrame, sourceCol: String,
                        maxRounds: Int): DataFrame = {
    require(maxRounds >= 0, s"maxRounds must be >= 0, got $maxRounds")
    val e = edges.select(col(srcCol).as("node"), col(dstCol).as("nxt"),
        col(weightCol).cast("long").as("w"))
      .persist()
    e.count()
    val seed = sources.select(col(sourceCol).as("node")).distinct()
      .withColumn("dist", lit(0L))
    var (dist, sig) =
      graft.operators.Converge.checkpointWithSig(seed, "node, dist")
    var round = 0
    var done = false
    while (!done && round < maxRounds) {
      round += 1
      val relaxed = dist.join(e, "node")
        .select(col("nxt").as("node"), (col("dist") + col("w")).as("dist"))
        .unionByName(dist)
        .groupBy(col("node")).agg(min(col("dist")).as("dist"))
      val (next, nSig) =
        graft.operators.Converge.checkpointWithSig(relaxed, "node, dist")
      // the 64-bit signature is probabilistic; a collision here would
      // silently truncate relaxation, so the match is CONFIRMED with
      // one exact comparison (both frames are checkpointed and
      // node-unique; equal counts ride in the signature) — the
      // duplicateClusters certainty-at-the-match pattern, one extra
      // tiny job on the terminating round only
      done = nSig == sig && graft.operators.Converge.sameExact(next, dist)
      sig = nSig
      dist = next
    }
    val out = dist.select(col("node").as("node_id"), col("dist"))
    e.unpersist()
    out
  }
}
