package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pivot-sampled BETWEENNESS centrality (Brandes, "A faster algorithm
  * for betweenness centrality", J. Math. Sociol. 25(2), 2001; pivot
  * sampling per Brandes & Pich, "Centrality estimation in large
  * networks", 2007) — the flow-based member of the centrality family:
  * where harmonic/closeness ([[Sssp.pivotCentralityBitset]]) score how
  * NEAR a node is to everything, betweenness scores how often it lies
  * ON shortest paths between others — the broker/bottleneck metric.
  *
  * Two level-synchronous passes per the Brandes recurrence, both
  * shared across all k pivots in the same tagged (src, node) rounds:
  *
  *  1. FORWARD — BFS layers carrying the shortest-path COUNT σ:
  *     a node first reached at hop h has σ = Σ σ(pred) over its
  *     hop-(h−1) predecessors (level-synchronous BFS sees every
  *     predecessor in the same frontier, so σ is complete at first
  *     reach). Per hop: one equi-join + one (src, node) sum
  *     partial-agg + one anti-join — [[Sssp.bfsDistancesPerSource]]'s
  *     shape with σ riding the frontier.
  *  2. BACKWARD — dependency accumulation δ from the deepest layer
  *     up: δ(v) = Σ over DAG successors w of
  *     ⌊σ_v · (10⁶ + δ(w)) / σ_w⌋ — Brandes' (σ_v/σ_w)(1 + δ_w) in
  *     exact-ppm integer arithmetic, each edge term floor-divided
  *     THEN summed, so an independent engine replays it bit-for-bit
  *     (the product runs in DECIMAL(38,0): σ can reach ~10⁸ on hub
  *     graphs and δ ~10¹¹, past the long·long bound). Per level: one
  *     equi-join of the level's δ rows against the edges + one
  *     (src, node) sum partial-agg.
  *
  * Betweenness(v) = Σ over pivots s≠v of δ_s(v), reported in ppm
  * (each (s,w) pair contributes 10⁶ split over its shortest paths).
  * Nodes on no sampled shortest path are omitted.
  *
  * SAMPLED and HOP-CAPPED by contract: k pivots (error decays ~1/√k,
  * a fixed constant as the corpus grows — the q_centrality rule) and
  * paths of ≤ maxHops edges (the deepest layer contributes δ = 0,
  * matching the truncated recurrence on both engines). State is
  * O(k · reached) tagged pairs and per-round shuffle is
  * O(k · frontier-incident edges) — the tagged centrality cost × 2
  * passes; σ/δ are per-pair VALUES, so the bitset mask trick does not
  * apply. Edges are taken as directed and deduplicated (simple-graph
  * semantics: parallel edge rows would double-count paths);
  * symmetrize first for undirected betweenness.
  */
object Betweenness {

  /** @param pivots  sampled source set (deduplicated)
    * @param maxHops inclusive cap on shortest-path length in edges
    * @return (node_id, betweenness_ppm) for every node with positive
    *         sampled dependency, pivots-as-endpoints excluded per the
    *         Brandes convention */
  def sampledBetweenness(edges: DataFrame, srcCol: String, dstCol: String,
                         pivots: DataFrame, pivotCol: String,
                         maxHops: Int): DataFrame = {
    require(maxHops >= 1, s"maxHops must be >= 1, got $maxHops")
    val e = edges.select(col(srcCol).as("node"), col(dstCol).as("nxt"))
      .distinct().persist()
    e.count()
    // FORWARD: per-level (src, node, sig) frames, each checkpointed
    // once (the backward pass re-reads them — checkpointed leaves
    // re-reference for free, the bfsDistancesPerSource discipline)
    val seed = pivots.select(col(pivotCol).as("src")).distinct()
      .select(col("src"), col("src").as("node"), lit(1L).as("sig"))
    var (layer, (nLayer, _)) =
      graft.operators.Converge.checkpointWithSig(seed, "src, node, sig")
    val layers = scala.collection.mutable.ArrayBuffer(layer)
    var seen = layer.select(col("src"), col("node"))
    var hop = 0
    while (nLayer > 0 && hop < maxHops) {
      hop += 1
      val cand = layer.join(e, "node")
        .select(col("src"), col("nxt").as("node"), col("sig"))
        .groupBy(col("src"), col("node")).agg(sum(col("sig")).as("sig"))
        .join(seen, Seq("src", "node"), "left_anti")
      val (next, (n, _)) =
        graft.operators.Converge.checkpointWithSig(cand, "src, node, sig")
      layer = next
      nLayer = n
      if (n > 0) {
        layers += layer
        seen = seen.unionByName(layer.select(col("src"), col("node")))
      }
    }
    // BACKWARD: δ per level from the deepest (δ = 0 — paths truncated
    // at the cap carry no dependency, the recurrence both engines
    // replay) up to the pivots; each level one join + one sum agg
    var del = layers.last.select(col("src"), col("node"), col("sig"),
      lit(0L).as("delta"))
    var acc = del.select(col("src"), col("node"), col("delta"))
    for (l <- layers.size - 2 to 0 by -1) {
      val succ = del
        .select(col("src"), col("node").as("w"), col("sig").as("sigw"),
          col("delta"))
        .join(e.select(col("node").as("v"), col("nxt").as("w")), Seq("w"))
        .select(col("src"), col("v").as("node"), col("sigw"), col("delta"))
      val stepped = layers(l)
        .join(succ, Seq("src", "node"), "left")
        .groupBy(col("src"), col("node"), col("sig"))
        .agg(coalesce(sum(expr(
          "cast(cast(sig as decimal(38,0)) * (1000000 + delta) " +
            "div sigw as bigint)")), lit(0L)).as("delta"))
      val (ck, _) = graft.operators.Converge.checkpointWithSig(
        stepped.select(col("src"), col("node"), col("sig"), col("delta")),
        "src, node, sig, delta")
      del = ck
      acc = acc.unionByName(del.select(col("src"), col("node"), col("delta")))
    }
    val out = acc.where(col("node") =!= col("src"))
      .groupBy(col("node"))
      .agg(sum(col("delta")).as("betweenness_ppm"))
      .where(col("betweenness_ppm") > 0)
      .select(col("node").as("node_id"), col("betweenness_ppm"))
    e.unpersist()
    out
  }
}
