package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-TRUSS decomposition (Cohen, "Trusses: cohesive subgraphs for
  * social network analysis", NSA technical report 2008) — the EDGE
  * analog of [[KCore]]: the k-truss is the maximal subgraph in which
  * every edge participates in at least k−2 triangles WITHIN the
  * subgraph. Where k-core keeps nodes with enough neighbors, k-truss
  * keeps edges with enough mutual reinforcement — the stricter
  * cohesive-community shape (every k-truss is a (k−1)-core, not vice
  * versa), the curation-graph tool for extracting tightly-knit
  * duplicate/citation clusters that degree alone over-merges.
  *
  * Shape: iterative support-and-peel to a fixpoint. Per round,
  * (1) per-edge SUPPORT = common-neighbor count over the CURRENT edge
  * set — one neighbor expansion join (edge (u,v) × u's neighbors w)
  * + one semi-join closing (w,v) + one (u,v) count partial-agg, the
  * [[Triangles]] closure costed on a shrinking graph; (2) edges with
  * support < k−2 drop. Removing an edge can only LOWER other edges'
  * support, so peeling is monotone and converges; a synchronous round
  * is a pure function of the edge set, so the signature-confirmed
  * early stop (the [[graft.operators.Converge]] discipline) equals
  * the full `maxRounds` unroll — which is what lets a fixed-round
  * DuckDB unroll hash-match the adaptive loop. Rounds past the
  * fixpoint remove nothing on both engines.
  *
  * Scale: state is the canonical edge set (shrinking); the per-round
  * cost is the oriented triangle closure — O(Σ deg(u)) candidate
  * rows, partial-agg-friendly, no window. Edges are taken as
  * UNDIRECTED simple edges (canonicalized, deduplicated, self-loops
  * dropped).
  */
object KTruss {

  /** Edges of the k-truss after at most `maxRounds` peel rounds
    * (signature-stopped at the fixpoint, which equals the full
    * unroll). Returns canonical (u, v) rows with u < v.
    *
    * @param k truss parameter ≥ 2 (k = 2 keeps every edge in a
    *          triangle-free-tolerant sense: support ≥ 0)
    */
  def kTruss(edges: DataFrame, srcCol: String, dstCol: String,
             k: Int, maxRounds: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    require(maxRounds >= 1, s"maxRounds must be >= 1, got $maxRounds")
    val canon = edges
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
    var (e, sig) = graft.operators.Converge.checkpointWithSig(canon, "u, v")
    var round = 0
    var done = false
    while (!done && round < maxRounds) {
      round += 1
      val sym = e.select(explode(array(
          struct(col("u").as("n"), col("v").as("m")),
          struct(col("v").as("n"), col("u").as("m")))).as("p"))
        .select(col("p.n").as("n"), col("p.m").as("m"))
      // support(u,v) = |common neighbors of u and v in the current
      // set|: expand u's neighbors w, close (w,v); each common w
      // counted once (sym holds each neighbor once — e is distinct)
      val support = e
        .join(sym.select(col("n").as("u"), col("m").as("w")), Seq("u"))
        .where(col("w") =!= col("v"))
        .join(e.select(col("u").as("wu"), col("v").as("wv")),
          least(col("w"), col("v")) === col("wu") &&
            greatest(col("w"), col("v")) === col("wv"),
          "left_semi")
        .groupBy(col("u"), col("v")).agg(count(lit(1)).as("sup"))
      val kept = e.join(support, Seq("u", "v"), "left")
        .where(coalesce(col("sup"), lit(0L)) >= (k - 2).toLong)
        .select(col("u"), col("v"))
      val (next, nSig) =
        graft.operators.Converge.checkpointWithSig(kept, "u, v")
      // signature match CONFIRMED exactly once at the match (the
      // weightedDistances discipline): an unchanged edge set is a
      // fixpoint, so stopping equals the full unroll
      done = nSig == sig && graft.operators.Converge.sameExact(next, e)
      sig = nSig
      e = next
    }
    e
  }

  /** INCREMENTAL k-truss maintenance under an edge-INSERT batch —
    * the truss family's entry in the saved-index repair matrix. Given
    * the SAVED k-truss T of the old graph and a batch B of new edges,
    * repair to the exact k-truss of old ∪ B without re-peeling the
    * whole graph, in two phases:
    *
    * 1. EXPAND — the affected region. Inserts only GROW the truss
    *    (T stays: its within-T supports are untouched), and every
    *    NEWLY-admitted edge is triangle-connected to a batch edge
    *    through other newly-admitted edges: if some set X of admitted
    *    non-T edges had all their supporting triangles inside T ∪ X
    *    with no batch edge reachable, T ∪ X would be a
    *    k-truss-satisfying subgraph of the OLD graph — contradicting
    *    T's maximality. So the candidate closure seeds at the
    *    truly-new batch edges and, frontier-style, adds any PEELED
    *    old edge sharing a triangle (in the union graph) with a
    *    region edge — per round one neighbor-expansion join from the
    *    frontier, never a full-graph pass.
    *
    * 2. PEEL the region only. Peeling T ∪ region from any superset
    *    of the true truss converges to the true truss ([[kTruss]]'s
    *    decreasing fixpoint), and by induction no T edge is ever
    *    removed (the current set always contains T, so a T edge's
    *    support never drops below its within-T support ≥ k−2) — so
    *    each round computes support for REGION edges alone against
    *    the T ∪ region adjacency, with the same synchronous-round /
    *    signature-stop semantics as the full peel. Per-batch cost
    *    tracks the region, not the corpus — the DRed shape
    *    [[graft.graph.TriangleDelta]] uses for triangle counts,
    *    lifted to the truss fixpoint.
    *
    * The PEEL loop THROWS on bound breach rather than truncate (the
    * delete-repair discipline: stopping early would emit a
    * non-truss). The EXPANSION loop instead FALLS BACK to the full
    * sound region (all peeled edges + batch) past its budget —
    * expansion is an optimization, and any superset of the true
    * closure peels to the same fixpoint, so a huge-cascade batch
    * degrades to ≈ one full recompute instead of failing. Result is
    * row-identical to `kTruss(old ∪ B)` either way — the equivalence
    * the oracle and spec gate.
    *
    * @param savedTruss canonical (u, v) rows from [[kTruss]] over
    *                   `edges` at the same `k` (a stale or
    *                   different-k table breaks the containment
    *                   invariant both phases rest on)
    */
  def kTrussIncremental(edges: DataFrame, newEdges: DataFrame,
                        srcCol: String, dstCol: String,
                        savedTruss: DataFrame, k: Int,
                        maxExpandRounds: Int,
                        maxPeelRounds: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    require(maxExpandRounds >= 1 && maxPeelRounds >= 1,
      s"round caps must be >= 1, got $maxExpandRounds/$maxPeelRounds")
    def canon(df: DataFrame, s: String, d: String): DataFrame = df
      .select(least(col(s), col(d)).as("u"),
        greatest(col(s), col(d)).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
    val oldE = canon(edges, srcCol, dstCol)
    val (truss, _) = graft.operators.Converge.checkpointWithSig(
      savedTruss.select(col("u"), col("v")), "u, v")
    // truly-new edges only: a batch edge already present changes no
    // triangle and would seed a spurious region
    val (ne, (nNew, _)) = graft.operators.Converge.checkpointWithSig(
      canon(newEdges, srcCol, dstCol)
        .join(oldE, Seq("u", "v"), "left_anti"), "u, v")
    if (nNew == 0) return truss
    val (all, _) = graft.operators.Converge.checkpointWithSig(
      oldE.unionByName(ne), "u, v")
    val (peeled, _) = graft.operators.Converge.checkpointWithSig(
      oldE.join(truss, Seq("u", "v"), "left_anti"), "u, v")
    val sym = all.select(explode(array(
        struct(col("u").as("n"), col("v").as("m")),
        struct(col("v").as("n"), col("u").as("m")))).as("p"))
      .select(col("p.n").as("n"), col("p.m").as("m"))
    // 1. EXPAND: frontier-style triangle-connectivity closure over
    // the peeled set, seeded at the batch. The closure is an
    // OPTIMIZATION, not a correctness gate — any region ⊇ the true
    // closure is sound (the peel fixes the rest) — so a closure that
    // out-lives its round budget (a batch so large its cascade spans
    // the peeled set one slow frontier at a time) FALLS BACK to the
    // full sound region (every peeled edge + the batch): the repair
    // then degrades gracefully to restricted-peel-over-everything
    // (≈ one full recompute) instead of burning budget rounds or
    // throwing on what is merely a lost optimization.
    var frontier = ne
    var nFrontier = nNew
    var region = ne
    var round = 0
    var fellBack = false
    // raised on fallback: a full-region peel can legitimately need
    // more rounds than the caller's region-tuned maxPeelRounds (r16
    // advice #4 — the "graceful" fallback could still throw in the
    // peel). Each non-final peel round removes at least one edge, so
    // the region's edge count (free: it IS the fallback checkpoint's
    // signature count) is a sound runaway guard for that path.
    var fallbackPeelBound = 0L
    while (nFrontier > 0) {
      round += 1
      if (round > maxExpandRounds) {
        val (ck, (nRegion, _)) = graft.operators.Converge.checkpointWithSig(
          peeled.unionByName(ne), "u, v")
        region = ck
        fallbackPeelBound = nRegion + 1
        nFrontier = 0
        fellBack = true
      } else {
      // triangles containing a frontier edge (u,v): common neighbors
      // w of u and v in the union graph (one neighbor expansion +
      // one closing semi-join, the kTruss support shape seeded small)
      val tri = frontier
        .join(sym.select(col("n").as("u"), col("m").as("w")), Seq("u"))
        .where(col("w") =!= col("v"))
        .join(all.select(col("u").as("wu"), col("v").as("wv")),
          least(col("w"), col("v")) === col("wu") &&
            greatest(col("w"), col("v")) === col("wv"),
          "left_semi")
      val others = tri
        .select(least(col("u"), col("w")).as("u"),
          greatest(col("u"), col("w")).as("v"))
        .unionByName(tri.select(least(col("v"), col("w")).as("u"),
          greatest(col("v"), col("w")).as("v")))
        .distinct()
      val fresh = others
        .join(peeled, Seq("u", "v"), "left_semi")
        .join(region, Seq("u", "v"), "left_anti")
      val (ck, (n, _)) =
        graft.operators.Converge.checkpointWithSig(fresh, "u, v")
      frontier = ck
      nFrontier = n
      if (n > 0)
        region = graft.operators.Converge
          .checkpointWithSig(region.unionByName(ck), "u, v")._1
      }
    }
    if (fellBack)
      System.err.println("[ktruss] region expansion exceeded " +
        s"$maxExpandRounds rounds; fell back to the full peeled region")
    // 2. PEEL the region against the T ∪ region adjacency; T edges
    // are kept by the containment invariant, never re-scored
    var (cur, sig) =
      graft.operators.Converge.checkpointWithSig(region, "u, v")
    round = 0
    val peelBound = math.max(maxPeelRounds.toLong, fallbackPeelBound)
    var done = false
    while (!done) {
      round += 1
      require(round <= peelBound,
        s"region peel exceeded $peelBound rounds")
      val curAll = truss.unionByName(cur)
      val symCur = curAll.select(explode(array(
          struct(col("u").as("n"), col("v").as("m")),
          struct(col("v").as("n"), col("u").as("m")))).as("p"))
        .select(col("p.n").as("n"), col("p.m").as("m"))
      val support = cur
        .join(symCur.select(col("n").as("u"), col("m").as("w")), Seq("u"))
        .where(col("w") =!= col("v"))
        .join(curAll.select(col("u").as("wu"), col("v").as("wv")),
          least(col("w"), col("v")) === col("wu") &&
            greatest(col("w"), col("v")) === col("wv"),
          "left_semi")
        .groupBy(col("u"), col("v")).agg(count(lit(1)).as("sup"))
      val kept = cur.join(support, Seq("u", "v"), "left")
        .where(coalesce(col("sup"), lit(0L)) >= (k - 2).toLong)
        .select(col("u"), col("v"))
      val (next, nSig) =
        graft.operators.Converge.checkpointWithSig(kept, "u, v")
      done = nSig == sig && graft.operators.Converge.sameExact(next, cur)
      sig = nSig
      cur = next
    }
    truss.unionByName(cur)
  }

  /** k-truss maintenance under an edge-DELETE batch —
    * [[kTrussIncremental]]'s retraction twin, completing
    * insert+delete at the truss fixpoint (the takedown/opt-out shape
    * the BFS and triangle families already cover). The key identity:
    * truss(G ∖ D) = truss(T ∖ D) where T is the saved truss — the
    * pruned graph's truss is contained in T (deleting edges never
    * adds truss membership) and in G ∖ D, hence in T ∖ D, and
    * maximality closes both inclusions — so the repair NEVER touches
    * the non-truss remainder of the graph.
    *
    * Within T ∖ D, the peel cascade is confined to the AFFECTED
    * REGION: an edge's support (always counted within the current
    * surviving set) can only drop when one of its triangles loses a
    * member, so every peeled edge is triangle-connected (within T)
    * to a deleted edge through other affected edges — the mirror of
    * the insert expansion's maximality argument. Phase 1 walks that
    * closure frontier-style from the deleted edges; phase 2 peels
    * the region alone against the stable ∪ region adjacency (stable
    * = T ∖ D ∖ region keeps its full within-T support by closure).
    * Expansion past its budget falls back to the full sound region
    * (all of T ∖ D); the peel throws on bound breach. Result is
    * row-identical to `kTruss(G ∖ D)` — the equivalence the oracle
    * and spec gate.
    *
    * @param savedTruss canonical (u, v) rows from [[kTruss]] over
    *                   `edges` at the same `k`
    */
  def kTrussDeleted(edges: DataFrame, deletedEdges: DataFrame,
                    srcCol: String, dstCol: String,
                    savedTruss: DataFrame, k: Int,
                    maxExpandRounds: Int,
                    maxPeelRounds: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    require(maxExpandRounds >= 1 && maxPeelRounds >= 1,
      s"round caps must be >= 1, got $maxExpandRounds/$maxPeelRounds")
    def canon(df: DataFrame, s: String, d: String): DataFrame = df
      .select(least(col(s), col(d)).as("u"),
        greatest(col(s), col(d)).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
    val (truss, _) = graft.operators.Converge.checkpointWithSig(
      savedTruss.select(col("u"), col("v")), "u, v")
    // only deletions INSIDE the truss matter: a pruned non-truss
    // edge was already absent from T, so T ∖ D = T and nothing moves
    val (del, (nDel, _)) = graft.operators.Converge.checkpointWithSig(
      canon(deletedEdges, srcCol, dstCol)
        .join(truss, Seq("u", "v"), "left_semi"), "u, v")
    if (nDel == 0) return truss
    val (tRem, (nRem, _)) = graft.operators.Converge.checkpointWithSig(
      truss.join(del, Seq("u", "v"), "left_anti"), "u, v")
    // T's symmetric adjacency — the closure walks triangles of the
    // SAVED truss (an over-approximation of every evolving set)
    val symT = truss.select(explode(array(
        struct(col("u").as("n"), col("v").as("m")),
        struct(col("v").as("n"), col("u").as("m")))).as("p"))
      .select(col("p.n").as("n"), col("p.m").as("m"))
    def triOthers(frontier: DataFrame): DataFrame = {
      val tri = frontier
        .join(symT.select(col("n").as("u"), col("m").as("w")), Seq("u"))
        .where(col("w") =!= col("v"))
        .join(truss.select(col("u").as("wu"), col("v").as("wv")),
          least(col("w"), col("v")) === col("wu") &&
            greatest(col("w"), col("v")) === col("wv"),
          "left_semi")
      tri.select(least(col("u"), col("w")).as("u"),
          greatest(col("u"), col("w")).as("v"))
        .unionByName(tri.select(least(col("v"), col("w")).as("u"),
          greatest(col("v"), col("w")).as("v")))
        .distinct()
    }
    // 1. EXPAND from the deleted edges through surviving truss edges
    var (frontier, (nFrontier, _)) =
      graft.operators.Converge.checkpointWithSig(
        triOthers(del).join(tRem, Seq("u", "v"), "left_semi"), "u, v")
    var region = frontier
    var round = 0
    var fellBack = false
    // raised on fallback (the insert repair's r16-advice fix,
    // mirrored): a full-tRem peel can need more rounds than the
    // caller's region-tuned bound; each non-final round removes at
    // least one edge, so the surviving-truss edge count (free from
    // the tRem checkpoint's signature) is the sound runaway guard
    var fallbackPeelBound = 0L
    while (nFrontier > 0) {
      round += 1
      if (round > maxExpandRounds) {
        region = tRem
        fallbackPeelBound = nRem + 1
        nFrontier = 0
        fellBack = true
      } else {
        val fresh = triOthers(frontier)
          .join(tRem, Seq("u", "v"), "left_semi")
          .join(region, Seq("u", "v"), "left_anti")
        val (ck, (n, _)) =
          graft.operators.Converge.checkpointWithSig(fresh, "u, v")
        frontier = ck
        nFrontier = n
        if (n > 0)
          region = graft.operators.Converge
            .checkpointWithSig(region.unionByName(ck), "u, v")._1
      }
    }
    if (fellBack)
      System.err.println("[ktruss] delete-region expansion exceeded " +
        s"$maxExpandRounds rounds; fell back to the full surviving truss")
    // 2. PEEL the region against the stable ∪ region adjacency
    // (del edges excluded by construction: both sides come from tRem)
    val stable = tRem.join(region, Seq("u", "v"), "left_anti")
    var (cur, sig) =
      graft.operators.Converge.checkpointWithSig(region, "u, v")
    round = 0
    val peelBound = math.max(maxPeelRounds.toLong, fallbackPeelBound)
    var done = false
    while (!done) {
      round += 1
      require(round <= peelBound,
        s"delete-region peel exceeded $peelBound rounds")
      val curAll = stable.unionByName(cur)
      val symCur = curAll.select(explode(array(
          struct(col("u").as("n"), col("v").as("m")),
          struct(col("v").as("n"), col("u").as("m")))).as("p"))
        .select(col("p.n").as("n"), col("p.m").as("m"))
      val support = cur
        .join(symCur.select(col("n").as("u"), col("m").as("w")), Seq("u"))
        .where(col("w") =!= col("v"))
        .join(curAll.select(col("u").as("wu"), col("v").as("wv")),
          least(col("w"), col("v")) === col("wu") &&
            greatest(col("w"), col("v")) === col("wv"),
          "left_semi")
        .groupBy(col("u"), col("v")).agg(count(lit(1)).as("sup"))
      val kept = cur.join(support, Seq("u", "v"), "left")
        .where(coalesce(col("sup"), lit(0L)) >= (k - 2).toLong)
        .select(col("u"), col("v"))
      val (next, nSig) =
        graft.operators.Converge.checkpointWithSig(kept, "u, v")
      done = nSig == sig && graft.operators.Converge.sameExact(next, cur)
      sig = nSig
      cur = next
    }
    stable.unionByName(cur)
  }

  /** TRUSSNESS decomposition — the per-edge analog of coreness: each
    * edge's trussness is the maximum k for which it survives in the
    * k-truss (2 for an edge in no triangle), capped at `maxK` (an
    * edge still alive in the maxK-truss reports maxK — the capped
    * contract an unrolled oracle replays). Computed by NESTED peeling
    * on the monotone chain (k+1)-truss ⊆ k-truss: level k peels from
    * level k−1's survivor set, never from the full graph, so the
    * total work is Σ over levels of a shrinking closure. Returns
    * (u, v, trussness) for every canonical input edge. */
  def trussness(edges: DataFrame, srcCol: String, dstCol: String,
                maxK: Int, maxRounds: Int): DataFrame = {
    require(maxK >= 2, s"maxK must be >= 2, got $maxK")
    val canon = edges
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
    // checkpoint the canonical set once: level 2 is read by both the
    // first peel and the final union, and an un-materialized canon
    // would re-run the least/greatest/distinct scan for each
    val (canonCk, _) =
      graft.operators.Converge.checkpointWithSig(canon, "u, v")
    var cur = canonCk
    var levels = Seq(canonCk.withColumn("t", lit(2L)))
    for (k <- 3 to maxK) {
      cur = kTruss(cur, "u", "v", k, maxRounds)
      levels :+= cur.withColumn("t", lit(k.toLong))
    }
    // an edge's trussness = the deepest level it survived; every
    // level frame is a checkpoint, so the union is a scan list
    levels.reduce(_ unionByName _)
      .groupBy(col("u"), col("v"))
      .agg(max(col("t")).as("trussness"))
  }

  /** INCREMENTAL trussness maintenance under an edge-INSERT batch —
    * [[kTrussIncremental]] lifted to the full decomposition. The
    * saved trussness table IS every old level at once (the nested
    * chain: old k-truss = rows with trussness ≥ k), and inserts are
    * level-monotone (each repaired level contains the old level), so
    * the levels repair as a CHAIN: level k's batch is exactly what
    * level k−1's repair ADMITTED beyond the old level
    * (cur_{k−1} ∖ old_{k−1}), its saved truss is the old level-k
    * slice, and [[kTrussIncremental]]'s contract holds at every rung
    * because old-level-(k−1) is precisely the graph the old level-k
    * truss was peeled from. Total work is Σ over levels of a
    * region-bounded repair — a quiet level (empty batch) short-
    * circuits to its saved slice for free. Result is row-identical
    * to [[trussness]] over old ∪ batch at the same `maxK`.
    *
    * @param savedTrussness (u, v, trussness) from [[trussness]] over
    *                       `edges` at the SAME maxK (a different cap
    *                       mis-slices every level above it)
    */
  def trussnessIncremental(edges: DataFrame, newEdges: DataFrame,
                           srcCol: String, dstCol: String,
                           savedTrussness: DataFrame, maxK: Int,
                           maxExpandRounds: Int,
                           maxPeelRounds: Int): DataFrame = {
    require(maxK >= 2, s"maxK must be >= 2, got $maxK")
    def canon(df: DataFrame, s: String, d: String): DataFrame = df
      .select(least(col(s), col(d)).as("u"),
        greatest(col(s), col(d)).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
    val (oldL2, _) = graft.operators.Converge.checkpointWithSig(
      canon(edges, srcCol, dstCol), "u, v")
    val (ne, (nNew, _)) = graft.operators.Converge.checkpointWithSig(
      canon(newEdges, srcCol, dstCol)
        .join(oldL2, Seq("u", "v"), "left_anti"), "u, v")
    val (saved, _) = graft.operators.Converge.checkpointWithSig(
      savedTrussness.select(col("u"), col("v"), col("trussness")),
      "u, v, trussness")
    if (nNew == 0) return saved
    var oldLevel = oldL2
    var curLevel = oldL2.unionByName(ne)
    var levels = Seq(curLevel.withColumn("t", lit(2L)))
    for (k <- 3 to maxK) {
      val savedK = saved.where(col("trussness") >= k.toLong)
        .select(col("u"), col("v"))
      val batchK = curLevel.join(oldLevel, Seq("u", "v"), "left_anti")
      val nextLevel = kTrussIncremental(oldLevel, batchK, "u", "v",
        savedK, k, maxExpandRounds, maxPeelRounds)
      levels :+= nextLevel.withColumn("t", lit(k.toLong))
      oldLevel = graft.operators.Converge
        .checkpointWithSig(savedK, "u, v")._1
      curLevel = nextLevel
    }
    levels.reduce(_ unionByName _)
      .groupBy(col("u"), col("v"))
      .agg(max(col("t")).as("trussness"))
  }

  /** Trussness maintenance under an edge-DELETE batch —
    * [[trussnessIncremental]]'s retraction twin, completing the
    * decomposition repair matrix. Unlike the insert side, the levels
    * need NO chain: the containment identity
    * truss_k(G ∖ D) = truss_k(T_k ∖ D) holds at every level
    * independently (deletes never ADD membership, so each repaired
    * level is already confined to its own saved slice — what the
    * insert chain threads from level k−1 is exactly what deletes
    * cannot produce), so each level is one region-bounded
    * [[kTrussDeleted]] over its slice and a quiet slice (no deleted
    * edge inside it) short-circuits for free. Result is
    * row-identical to [[trussness]] over `edges` ∖ D at the same
    * `maxK`.
    *
    * @param savedTrussness (u, v, trussness) from [[trussness]] over
    *                       `edges` at the SAME maxK */
  def trussnessDeleted(edges: DataFrame, deletedEdges: DataFrame,
                       srcCol: String, dstCol: String,
                       savedTrussness: DataFrame, maxK: Int,
                       maxExpandRounds: Int,
                       maxPeelRounds: Int): DataFrame = {
    require(maxK >= 2, s"maxK must be >= 2, got $maxK")
    def canon(df: DataFrame, s: String, d: String): DataFrame = df
      .select(least(col(s), col(d)).as("u"),
        greatest(col(s), col(d)).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
    val (oldL2, _) = graft.operators.Converge.checkpointWithSig(
      canon(edges, srcCol, dstCol), "u, v")
    val (del, (nDel, _)) = graft.operators.Converge.checkpointWithSig(
      canon(deletedEdges, srcCol, dstCol)
        .join(oldL2, Seq("u", "v"), "left_semi"), "u, v")
    val (saved, _) = graft.operators.Converge.checkpointWithSig(
      savedTrussness.select(col("u"), col("v"), col("trussness")),
      "u, v, trussness")
    if (nDel == 0) return saved
    val (newL2, _) = graft.operators.Converge.checkpointWithSig(
      oldL2.join(del, Seq("u", "v"), "left_anti"), "u, v")
    var levels = Seq(newL2.withColumn("t", lit(2L)))
    for (k <- 3 to maxK) {
      val savedK = saved.where(col("trussness") >= k.toLong)
        .select(col("u"), col("v"))
      val nextLevel = kTrussDeleted(oldL2, del, "u", "v",
        savedK, k, maxExpandRounds, maxPeelRounds)
      levels :+= nextLevel.withColumn("t", lit(k.toLong))
    }
    levels.reduce(_ unionByName _)
      .groupBy(col("u"), col("v"))
      .agg(max(col("t")).as("trussness"))
  }
}
