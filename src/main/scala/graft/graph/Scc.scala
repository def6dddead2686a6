package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Converge.SanitizedCheckpoint

/** Strongly connected components of a DIRECTED graph via iterative
  * coloring (the Orzan/FB-coloring family — the published scalable
  * SCC form; Tarjan is inherently sequential and never distributes).
  *
  * Outer loop, until every node is assigned:
  *  1. COLOR: within the active subgraph, propagate
  *     color(v) = max(v, max_{u→v} color(u)) to a fixed point —
  *     color(v) is the maximum active id that can reach v.
  *  2. MARK: each color's root r (the node whose id IS its color)
  *     plus every node with a same-color path TO r form exactly
  *     r's SCC (if v is marked, r reaches v via the color relation
  *     and v reaches r via the path, so they are mutual; conversely
  *     a member's whole v→r path carries color r — any bigger-id
  *     intruder reaching a path node would reach r and contradict
  *     color(r)=r). Propagated backward to a fixed point.
  *  3. Emit marked nodes with scc_id = color (= the SCC's MAX
  *     member id), peel them from the active set, repeat.
  *
  * Every step is one equi-join + partial-agg max / left_semi — the
  * PageRank communication shape; fixed points converge in ≤ diameter
  * rounds and each outer pass assigns at least every current color
  * root, so passes are bounded by the SCC-DAG depth. Convergence is
  * detected by the [[graft.dedup.Dedup.duplicateClusters]] signature
  * trick — a (count, bit_xor(xxhash64)) pair per round, so the
  * driver sees two longs, never node data — collected by
  * [[graft.operators.Converge]] DURING each round's localCheckpoint
  * job (one job per round, not checkpoint + separate aggregate).
  */
object Scc {

  /** @param finishNodes once the ACTIVE remainder has at most this
    *                     many nodes (and `finishEdges` edges), finish
    *                     it with one sequential Tarjan pass on the
    *                     driver — the standard FB-hybrid endgame from
    *                     the literature: the distributed peels shrink
    *                     the graph geometrically, then dozens of
    *                     near-empty peel rounds (each a fixed set of
    *                     scheduler-bound jobs) would dominate wall
    *                     time; a BOUNDED collect (≲ a few MB by these
    *                     thresholds, the BPE-argmax class of
    *                     control-plane transfer) replaces them with
    *                     microseconds of driver work. The component
    *                     MAX is still computed by Spark expressions,
    *                     so cross-engine ordering of ids is untouched.
    * @return (node_id, scc_id) for every endpoint of `edges`, where
    *         scc_id is the component's maximum member id. */
  def scc(edges: DataFrame, srcCol: String, dstCol: String,
          maxOuter: Int = 50, maxInner: Int = 200,
          finishNodes: Long = 100000L,
          finishEdges: Long = 1000000L): DataFrame = {
    // node universe BEFORE the self-loop filter (a self-loop-only
    // node is a singleton SCC, not a dropped row)
    val eRaw = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val allNodes = eRaw.select(col("src").as("node"))
      .unionByName(eRaw.select(col("dst").as("node"))).distinct()
    val e0 = eRaw.where(col("src") =!= col("dst")).distinct().persist()
    e0.count()

    var (active, activeSig) = graft.operators.Converge.checkpointWithSig(
      allNodes, "node")
    var nActive = activeSig._1
    var parts = List.empty[DataFrame]
    var outer = 0
    while (nActive > 0) {
      outer += 1
      require(outer <= maxOuter, s"SCC exceeded $maxOuter peel passes")
      val ea = e0
        .join(active.withColumnRenamed("node", "src"), Seq("src"), "left_semi")
        .join(active.withColumnRenamed("node", "dst"), Seq("dst"), "left_semi")
        .persist()
      val eaCount = ea.count()

      if (nActive <= finishNodes && eaCount <= finishEdges) {
        // ENDGAME: the remainder fits the documented bound — one
        // sequential Tarjan pass instead of more scheduler-bound
        // peel rounds (see the finishNodes param doc)
        val spark = active.sparkSession
        val nodeVals: Array[Any] = active.collect().map(_.get(0))
        val idx = nodeVals.zipWithIndex.toMap
        val adjB = Array.fill(nodeVals.length)(
          scala.collection.mutable.ArrayBuffer.empty[Int])
        ea.select(col("src"), col("dst")).collect().foreach { r =>
          adjB(idx(r.get(0))) += idx(r.get(1))
        }
        val comp = tarjanComponents(nodeVals.length, adjB.map(_.toArray))
        val schema = org.apache.spark.sql.types.StructType(Seq(
          active.schema.fields(0).copy(name = "node"),
          org.apache.spark.sql.types.StructField("comp",
            org.apache.spark.sql.types.IntegerType, nullable = false)))
        val rows: java.util.List[org.apache.spark.sql.Row] =
          java.util.Arrays.asList(nodeVals.indices.map(i =>
            org.apache.spark.sql.Row(nodeVals(i), comp(i))): _*)
        // the component MAX goes back through Spark's own ordering
        val df = spark.createDataFrame(rows, schema)
        val reps = df.groupBy(col("comp")).agg(max(col("node")).as("scc_id"))
        parts ::= df.join(reps, Seq("comp"))
          .select(col("node").as("node_id"), col("scc_id"))
        ea.unpersist(blocking = false)
        nActive = 0
      } else {

      // 1. forward max-color fixed point. Propagation is MONOTONE
      // (colors only grow), so a fixed point of the doubled step is a
      // fixed point of the single step — two hops are fused into each
      // checkpointed round, halving the dominant per-round job count.
      // (r19 A/B: fusing FOUR hops per checkpoint was measured SLOWER
      // at sf0.1 — the 16-leaf lazy block's planning/stage cost
      // exceeds the saved checkpoints; two is the sweet spot.)
      def colorStep(c: DataFrame): DataFrame = {
        val msgs = ea
          .join(c.withColumnRenamed("node", "src"), Seq("src"))
          .groupBy(col("dst")).agg(max(col("color")).as("m"))
          .withColumnRenamed("dst", "node")
        c.join(msgs, Seq("node"), "left_outer")
          .select(col("node"),
            greatest(col("color"), coalesce(col("m"), col("color")))
              .as("color"))
      }
      var (color, cSig) = graft.operators.Converge.checkpointWithSig(
        active.select(col("node"), col("node").as("color")), "node, color")
      var rounds = 0
      var done = false
      while (!done) {
        rounds += 1
        require(rounds <= maxInner, s"color pass exceeded $maxInner rounds")
        val (next, nSig) = graft.operators.Converge.checkpointWithSig(
          colorStep(colorStep(color)), "node, color")
        done = nSig == cSig
        cSig = nSig
        color = next
      }

      // 2. backward mark within color classes, from the roots
      val eColored = ea
        .join(color.select(col("node").as("src"), col("color").as("cs")),
          Seq("src"))
        .join(color.select(col("node").as("dst"), col("color").as("cd")),
          Seq("dst"))
        .where(col("cs") === col("cd"))
        .select(col("src"), col("dst"), col("cs").as("color"))
        .persist()
      eColored.count()
      // marked-set growth is monotone too — same doubled-step trick
      def markStep(m: DataFrame): DataFrame = {
        val newMarks = eColored
          .join(m.select(col("node").as("dst")), Seq("dst"), "left_semi")
          .select(col("src").as("node"), col("color"))
        m.unionByName(newMarks).distinct()
      }
      var (marked, mSig) = graft.operators.Converge.checkpointWithSig(
        color.where(col("node") === col("color")), "node")
      rounds = 0
      done = false
      while (!done) {
        rounds += 1
        require(rounds <= maxInner, s"mark pass exceeded $maxInner rounds")
        val (next, nSig) = graft.operators.Converge.checkpointWithSig(
          markStep(markStep(marked)), "node")
        done = nSig == mSig
        mSig = nSig
        marked = next
      }

      parts ::= marked.select(col("node").as("node_id"),
        col("color").as("scc_id"))
      // count rides the checkpoint's own observation (one job, the
      // Converge discipline) instead of a separate count action
      val (nextActive, aSig) = graft.operators.Converge.checkpointWithSig(
        active.join(marked.select(col("node")), Seq("node"), "left_anti"),
        "node")
      ea.unpersist(blocking = false)
      eColored.unpersist(blocking = false)
      active = nextActive
      nActive = aSig._1
      }
    }
    e0.unpersist(blocking = false)
    // empty edge input → empty (correctly-typed) result
    parts.reduceOption(_.unionByName(_)).getOrElse(
      allNodes.select(col("node").as("node_id"), col("node").as("scc_id")))
  }

  /** Iterative (explicit-stack) Tarjan over an adjacency array —
    * the endgame's sequential pass. Returns a component index per
    * vertex; component identity semantics (max member) are applied
    * by the caller through Spark expressions. */
  private def tarjanComponents(n: Int,
                               adj: Array[Array[Int]]): Array[Int] = {
    val index = Array.fill(n)(-1)
    val low = new Array[Int](n)
    val onStack = Array.fill(n)(false)
    val stack = scala.collection.mutable.ArrayBuffer.empty[Int]
    val comp = Array.fill(n)(-1)
    var nComp = 0
    var counter = 0
    for (root <- 0 until n if index(root) < 0) {
      val work = scala.collection.mutable.ArrayBuffer[(Int, Int)]((root, 0))
      index(root) = counter; low(root) = counter; counter += 1
      stack += root; onStack(root) = true
      while (work.nonEmpty) {
        val (v, ci) = work.last
        if (ci < adj(v).length) {
          work(work.length - 1) = (v, ci + 1)
          val w = adj(v)(ci)
          if (index(w) < 0) {
            index(w) = counter; low(w) = counter; counter += 1
            stack += w; onStack(w) = true
            work += ((w, 0))
          } else if (onStack(w)) {
            low(v) = math.min(low(v), index(w))
          }
        } else {
          work.remove(work.length - 1)
          if (work.nonEmpty) {
            val p = work.last._1
            low(p) = math.min(low(p), low(v))
          }
          if (low(v) == index(v)) {
            var w = -1
            while (w != v) {
              w = stack.remove(stack.length - 1)
              onStack(w) = false
              comp(w) = nComp
            }
            nComp += 1
          }
        }
      }
    }
    comp
  }
}
