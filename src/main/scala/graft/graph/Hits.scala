package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Converge.SanitizedCheckpoint

/** HITS hubs & authorities over a DIRECTED edge table, in exact
  * fixed-point arithmetic — the link-analysis companion to
  * [[PageRank]] (same per-round communication pattern, opposite
  * normalization trick).
  *
  * Per round: auth(v) = Σ_{u→v} hub(u), then hub(v) = Σ_{v→w}
  * auth(w), each renormalized. Classic HITS normalizes by the L2
  * norm — a square root, never integer-exact — so this
  * implementation normalizes by the MAXIMUM (L∞): after each
  * half-step every score is `score·SCALE div max(score)`, pure
  * integer floor division. L∞ scaling preserves the power-iteration
  * direction (only the normalization constant differs), keeps the
  * top hub/authority pinned at exactly SCALE, and makes the result
  * bit-identical across partitionings and engines — the same
  * reasoning as PageRank's ppm arithmetic, where a float HITS could
  * never hash-match an oracle.
  *
  * Scale design: each half-step is ONE equi-join (edges ⋈ scores) +
  * one partially-aggregated groupBy sum; score state is one row per
  * node and broadcasts when small (AQE). The normalization max is a
  * 1-row aggregate attached by broadcast — never a driver round-trip
  * in the loop body. Per-round plan growth is truncated with an
  * eager localCheckpoint on the (tiny) score frame. Overflow bound:
  * a node's raw half-step sum is ≤ degree·SCALE, so degrees up to
  * ~9.2×10¹² fit the long sum — beyond any real web graph's
  * in-degree. The normalization multiply (`score · SCALE`) would
  * overflow a long already at degree ≈ 9.2×10⁶ (real web graphs DO
  * exceed that in-degree), so it is routed through DECIMAL(38,0) —
  * the same overflow discipline as `AssocRules.lift` and the
  * q_graph_stats oracle — making the whole pipeline exact up to the
  * sum bound.
  *
  * Nodes with no in-edges have authority 0; with no out-edges, hub 0
  * (on a bipartite graph like customer→supplier this degenerates to
  * the meaningful "customers are hubs, suppliers are authorities"
  * split, which is what `q_hits` exercises).
  */
object Hits {
  val Scale = 1000000L // 1.0 in ppm fixed point

  /** @param edges directed (srcCol, dstCol)
    * @return (node_id, hub_ppm, auth_ppm) for every node appearing
    *         as a src or dst, exact after `iters` rounds; a
    *         signature-confirmed unchanged hub table stops the loop
    *         early with output identical to the full unroll (a round
    *         is a pure function of the hub table) */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
           iters: Int): DataFrame = {
    val (e, nodes) = prep(edges, srcCol, dstCol)
    finish(e, nodes,
      iterate(e, nodes, nodes.select(col("node"), lit(Scale).as("hub")),
        iters))
  }

  /** WARM-START HITS — resume the exact L∞-normalized iteration from
    * a SAVED hub vector for `iters` more rounds over the (possibly
    * changed) edge table: [[PageRank.pageRankResume]]'s discipline at
    * the hub/authority pair. A full round is a pure function of the
    * HUB table (auth_k = f(hub_{k−1}), hub_k = g(auth_k)), so saving
    * only the hub column suffices and the trajectory identity
    * resume(g, hits(g, i), j) = hits(g, i+j) holds verbatim on an
    * unchanged graph — the spec-proven contract, and what makes the
    * staged-artifact oracle replayable as one longer unroll. Nodes
    * the batch introduces (absent from `savedHubs`) seed at the
    * uniform init SCALE, exactly as a cold start would. Equality of
    * CONVERGED warm and cold runs after a batch is deliberately NOT
    * the contract: the floor-normalized integer map admits adjacent
    * fixpoints exactly like PageRank's ppm arithmetic.
    *
    * @param savedHubs (node_id, hub_ppm, …) from a prior [[hits]] run */
  def hitsResume(edges: DataFrame, srcCol: String, dstCol: String,
                 savedHubs: DataFrame, iters: Int): DataFrame = {
    val (e, nodes) = prep(edges, srcCol, dstCol)
    val hub0 = nodes
      .join(savedHubs.select(col("node_id").as("node"), col("hub_ppm")),
        Seq("node"), "left")
      .select(col("node"), coalesce(col("hub_ppm"), lit(Scale)).as("hub"))
    // the cold init is all-SCALE so lInfNorm's "max > 0" invariant
    // holds by construction; a WARM init inherits the artifact, and a
    // resumed edge set whose every node was a pure sink in the saved
    // run (hub_ppm 0 everywhere) would feed the first half-step an
    // all-zero vector — the div would NULL-propagate silently. Fail
    // loudly instead: such an artifact carries no usable direction
    // and the caller should cold-start.
    val hubMax = hub0.agg(max(col("hub"))).head()
    require(!hubMax.isNullAt(0) && hubMax.getLong(0) > 0L,
      "hitsResume: the saved hub vector is all-zero on this edge set " +
        "(every resumed node was a pure sink in the artifact) — the " +
        "warm start has no direction to resume; run hits() cold instead")
    finish(e, nodes, iterate(e, nodes, hub0, iters))
  }

  private def prep(edges: DataFrame, srcCol: String,
                   dstCol: String): (DataFrame, DataFrame) = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().persist()
    e.count() // materialize before the per-round joins fan out
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .distinct().persist()
    (e, nodes)
  }

  /** Materialize the (one-row-per-node) result, then release the two
    * iteration caches — the PageRank/LabelProp/KCore house
    * convention: a long-lived session running many HITS gates must
    * not accumulate cached edge/node blocks (the checkpoint keeps the
    * result readable after the unpersist). */
  private def finish(e: DataFrame, nodes: DataFrame,
                     out: DataFrame): DataFrame = {
    val result = out.sanitizedCheckpoint()
    e.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    result
  }

  /** The shared iteration: `iters` exact rounds from `hub0`. */
  private def iterate(e: DataFrame, nodes: DataFrame, hub0: DataFrame,
                      iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    // score·SCALE div max(score), with max attached as a broadcast
    // 1-row frame (scores are non-negative; an all-zero frame would
    // mean an empty edge set, excluded by construction). The multiply
    // runs in DECIMAL(38,0): score is bounded by degree·SCALE, so a
    // long `score * SCALE` wraps once in-degree exceeds ~9.2e6.
    def lInfNorm(scores: DataFrame, c: String): DataFrame = {
      val mx = scores.agg(max(col(c)).as("__mx"))
      scores.crossJoin(broadcast(mx))
        .select(col("node"),
          expr(s"CAST((CAST($c AS DECIMAL(38,0)) * ${Scale}L) div __mx AS BIGINT)")
            .as(c))
    }

    var hub = hub0
    var auth: DataFrame = null
    // hub signature from the previous round: a full round is a pure
    // function of the hub table (auth_k = f(hub_k-1), hub_k =
    // g(auth_k)), so an unchanged hub (signature match on the hub
    // half-step's OWN checkpoint job, confirmed exactly once at the
    // match) fixes both tables — early stop equals the full unroll
    var sig: (Long, Long) = null
    var it = 0
    var done = false
    while (!done && it < iters) {
      it += 1
      val rawAuth = e.join(hub.withColumnRenamed("node", "src"), Seq("src"))
        .groupBy(col("dst")).agg(sum(col("hub")).as("auth"))
        .withColumnRenamed("dst", "node")
      auth = lInfNorm(
        nodes.join(rawAuth, Seq("node"), "left_outer")
          .select(col("node"), coalesce(col("auth"), lit(0L)).as("auth")),
        "auth").sanitizedCheckpoint()
      val rawHub = e.join(auth.withColumnRenamed("node", "dst"), Seq("dst"))
        .groupBy(col("src")).agg(sum(col("auth")).as("hub"))
        .withColumnRenamed("src", "node")
      val (nextHub, nSig) = graft.operators.Converge.checkpointWithSig(
        lInfNorm(
          nodes.join(rawHub, Seq("node"), "left_outer")
            .select(col("node"), coalesce(col("hub"), lit(0L)).as("hub")),
          "hub"),
        "node, hub")
      done = sig != null && nSig == sig &&
        graft.operators.Converge.sameExact(nextHub, hub)
      sig = nSig
      hub = nextHub
    }
    nodes.join(hub, Seq("node")).join(auth, Seq("node"))
      .select(col("node").as("node_id"), col("hub").as("hub_ppm"),
        col("auth").as("auth_ppm"))
  }
}
