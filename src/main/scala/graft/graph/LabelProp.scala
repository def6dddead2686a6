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
  * a handful of rounds) with a signature-confirmed early stop checked
  * at every SECOND round's checkpoint: a synchronous round is a pure
  * function of the label table, so state(r) = state(r−2) makes the
  * orbit periodic with period dividing 2 and the unroll's final state
  * is determined by parity — catching both fixpoints and the
  * includeSelf=false bipartite oscillation, still exactly equal to
  * the full unroll.
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
    * @param labelOf initial label of a node id, default the id
    *                itself. r19 (guide §2.3): label VALUES are
    *                min/max-ordered, so the r18 long-key bijection
    *                cannot replace them — but join KEYS are pure
    *                equi-keys, so a caller may run the loop on long
    *                node keys while `labelOf` seeds the ORIGINAL
    *                string labels: per-round vote multisets and the
    *                (count desc, label asc) tie-break are then
    *                identical to the all-string run, with every
    *                shuffle/join keyed on longs.
    * @return (node_id, label): the community label after `iters`
    *         rounds; isolated label-sinks keep their own initial
    *         label */
  def propagate(edges: DataFrame, srcCol: String, dstCol: String,
                iters: Int, includeSelf: Boolean = true,
                labelOf: org.apache.spark.sql.Column =>
                  org.apache.spark.sql.Column = identity): DataFrame =
    run(edges, srcCol, dstCol, None, iters, includeSelf, labelOf)

  /** WARM-START LPA — resume the synchronous propagation from a
    * SAVED labeling after an edge batch: the community family's
    * member of the saved-index repair matrix. A synchronous round is
    * a pure function of the label table, so the trajectory identity
    * resume(g, propagate(g, i), j) = propagate(g, i+j) holds verbatim
    * on an unchanged graph (the spec-proven contract, replayable by
    * the oracle as one longer unroll). Nodes the batch introduces
    * (absent from `savedLabels`) seed at their own id, exactly as a
    * cold start would. The contract is TRAJECTORY-exact, not
    * converged-equivalence: LPA's argmax map from two different
    * starts may legitimately settle in different (both valid)
    * labelings — the PageRank adjacent-fixpoint caveat in community
    * form — so what a pipeline relies on is that resuming from the
    * converged artifact re-stabilizes in rounds tracking the BATCH's
    * perturbation, not the graph's mixing time.
    *
    * @param savedLabels (node_id, label) from a prior run */
  def resume(edges: DataFrame, srcCol: String, dstCol: String,
             savedLabels: DataFrame, iters: Int,
             includeSelf: Boolean = true,
             labelOf: org.apache.spark.sql.Column =>
               org.apache.spark.sql.Column = identity): DataFrame =
    run(edges, srcCol, dstCol, Some(savedLabels), iters, includeSelf,
      labelOf)

  private def run(edges: DataFrame, srcCol: String, dstCol: String,
                  saved: Option[DataFrame], iters: Int,
                  includeSelf: Boolean,
                  labelOf: org.apache.spark.sql.Column =>
                    org.apache.spark.sql.Column): DataFrame = {
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
    var labels = saved match {
      case None =>
        nodes.select(col("node"), labelOf(col("node")).as("label"))
      case Some(sv) => nodes
        .join(sv.select(col("node_id").as("node"), col("label")),
          Seq("node"), "left")
        .select(col("node"),
          coalesce(col("label"), labelOf(col("node"))).as("label"))
    }
    // One synchronous round as a pure function of the label table —
    // each round references `labels` exactly ONCE (the join), so a
    // short lazy chain of rounds cannot blow up the way the
    // twice-referenced self-vote shape did.
    def round(cur: DataFrame): DataFrame = {
      val votes = e
        .join(cur.withColumnRenamed("node", "src"), Seq("src"))
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
      if (includeSelf) voted
      else nodes.join(voted, Seq("node"), "left")
        .select(col("node"),
          coalesce(col("label"), labelOf(col("node"))).as("label"))
    }
    // Checkpoint + signature every SECOND round (r14 claw-back of the
    // adjudicated +1.75 s per-round-materialization cost — BASELINE
    // "Loop early-stop adjudication"): plan depth stays bounded at two
    // lazy rounds, half the materializations, and the stop check
    // compares checkpoint r against checkpoint r−2. A match means
    // state(r) = state(r−2); a synchronous round is a pure function of
    // the table, so from r−2 on the orbit is PERIODIC with period
    // dividing 2 — the full unroll lands on the state whose parity
    // matches `iters` (one extra lazy round when iters−r is odd).
    // This is strictly stronger than the old consecutive-round
    // fixpoint check: it also terminates the includeSelf=false
    // bipartite two-coloring oscillation, still exactly equal to the
    // round-unrolled oracle. Stop lag ≤ 1 round vs per-round checks.
    var prevSig: (Long, Long) = null
    var prev: DataFrame = null
    var it = 0
    var done = false
    // tracks whether `labels` is a materialized checkpoint; a lazy
    // tail (odd iters, or the parity-fix round after the stop) must
    // be checkpointed BEFORE e/nodes unpersist, or the caller's
    // action re-derives the edge prep uncached
    var materialized = false
    while (!done && it < iters) {
      it += 1
      val stepped = round(labels)
      if (it % 2 == 0) {
        val (next, nSig) =
          graft.operators.Converge.checkpointWithSig(stepped, "node, label")
        if (prevSig != null && nSig == prevSig &&
            graft.operators.Converge.sameExact(next, prev)) {
          val odd = (iters - it) % 2 == 1
          labels = if (odd) round(next) else next
          materialized = !odd
          done = true
        } else {
          prevSig = nSig
          prev = next
          labels = next
          materialized = true
        }
      } else { labels = stepped; materialized = false }
    }
    if (!materialized)
      labels = graft.operators.Converge
        .checkpointWithSig(labels, "node, label")._1
    val out = labels.select(col("node").as("node_id"), col("label"))
    e.unpersist()
    nodes.unpersist()
    out
  }
}
