package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronous label propagation (LPA) community detection over an
  * edge table — the cheap communities-without-a-modularity-solver
  * operator: every node starts labeled with its own id, and each round
  * adopts the most frequent label among its neighbors (optionally
  * counting its own current label as one vote), ties broken by the
  * smallest label. A fixed iteration count plus the total tie-break
  * order makes the result fully deterministic — engine-, partitioning-
  * and schedule-independent — unlike textbook LPA's random tie-breaks,
  * so an independent serial engine can replay it exactly.
  * [[graft.dedup.Dedup.duplicateClusters]] answers "which nodes are
  * CONNECTED"; this answers "which nodes are DENSELY connected" —
  * communities, not components.
  *
  * Scale shape: per round, ONE equi-join (edges ⋈ labels on src —
  * label state is one row per node, tiny next to the edge table, and
  * AQE broadcasts it when small) and a two-stage aggregation:
  * groupBy(node, label) vote counts (map-side combined), then a
  * groupBy(node) `min_by` argmax — both partial-agg friendly, no
  * window sort, no per-round pass over anything edge-sized beyond the
  * one join. The iteration cap is a small constant (LPA stabilizes in
  * a handful of rounds) with a signature-confirmed early stop: a
  * synchronous round is a pure function of the label table, so an
  * unchanged table is a fixpoint and stopping equals the full unroll.
  *
  * `includeSelf = true` (default) is also the standard damping for
  * bipartite graphs, where pure synchronous LPA oscillates
  * two-colorings forever.
  */
object LabelProp {

  /** @param edges   directed edges (srcCol, dstCol); symmetrize
    *                beforehand for an undirected graph
    * @param iters   fixed round count (determinism over convergence)
    * @param includeSelf count the node's own current label as one vote
    * @return (node_id, label): the community label after `iters`
    *         rounds; isolated label-sinks keep their own id */
  def propagate(edges: DataFrame, srcCol: String, dstCol: String,
                iters: Int, includeSelf: Boolean = true): DataFrame = {
    require(iters >= 1, "iters must be at least 1")
    val e0 = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val nodes = e0.select(col("src").as("node"))
      .union(e0.select(col("dst").as("node"))).distinct().persist()
    // the self-vote is a SELF-LOOP EDGE added once, not a per-round
    // union with the label table: referencing `labels` twice per
    // round would double the lazy plan every round (2^iters copies of
    // round 1 by the end — measured 14.5 s vs ~5 s at sf0.1 for 3
    // rounds). With the loop edges in the one persisted edge table,
    // each round touches `labels` exactly once and all rounds fuse
    // into one job at materialization, like PageRank.
    val e = (if (includeSelf)
        e0.unionByName(nodes.select(col("node").as("src"),
          col("node").as("dst")))
      else e0).persist()
    e.count()
    var labels = nodes.select(col("node"), col("node").as("label"))
    // label-table signature from the previous round: a synchronous
    // round is a pure function of the label table, so an unchanged
    // table (signature match riding the round's own checkpoint job,
    // confirmed exactly once at the match) is a fixpoint — early stop
    // equals the full unroll, which is what keeps the round-unrolled
    // oracle exact. The per-round localCheckpoint also bounds plan
    // depth for large caps (the duplicateClusters discipline).
    var sig: (Long, Long) = null
    var it = 0
    var done = false
    while (!done && it < iters) {
      it += 1
      val votes = e
        .join(labels.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"), col("label"))
      val counts = votes.groupBy(col("node"), col("label"))
        .agg(count(lit(1)).as("n"))
      // argmax (count desc, label asc) as a partial-agg-friendly
      // min_by over (-n, label) — the label component makes the
      // ordering key unique, so min_by's tie behavior never engages
      val voted = counts.groupBy(col("node"))
        .agg(min_by(col("label"), struct((-col("n")).as("neg_n"),
          col("label").as("l"))).as("label"))
      // a node can receive zero votes only with includeSelf=false and
      // no in-edges; it keeps its own id
      val stepped =
        if (includeSelf) voted
        else nodes.join(voted, Seq("node"), "left")
          .select(col("node"), coalesce(col("label"), col("node")).as("label"))
      val (next, nSig) =
        graft.operators.Converge.checkpointWithSig(stepped, "node, label")
      done = sig != null && nSig == sig &&
        graft.operators.Converge.sameExact(next, labels)
      sig = nSig
      labels = next
    }
    val out = labels.select(col("node").as("node_id"), col("label"))
    e.unpersist()
    nodes.unpersist()
    out
  }
}
