package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.Converge.SanitizedCheckpoint

/** Deterministic random-walk corpus generation — the DeepWalk /
  * node2vec front end: emit `walksPerNode` walks of `len` steps from
  * every node, then feed the walk sequences to the existing
  * co-occurrence machinery ([[graft.functions.Vocab.skipgramCounts]],
  * PMI, embedding training) exactly like text. The RNG is replaced by
  * a SEEDED HASH — step t of walk w moves to the neighbor u
  * minimizing `hash64(seed:w:t:u)` — so the "random" corpus is a pure
  * function of (graph, seed): engine-replayable, oracle-checkable,
  * and stable across partitionings, the same determinism discipline
  * as every sampler in this repo (q_sample_det's hash-bucket rule).
  *
  * Scale shape: the frontier is (nodes × walksPerNode) rows; each
  * step is ONE node-keyed equi-join against the adjacency followed by
  * a map-side-combinable min_by argmin per walk — no per-walk driver
  * loop, no walk ever leaves the cluster. Walk state is one row per
  * walk (current node), localCheckpointed per step so step k never
  * re-runs steps 1..k-1. Dead-end nodes (no out-edges) end their walk
  * early — their rows simply stop appearing at later steps.
  */
object RandomWalks {

  /** @return (walk_id, step, node): step 0 is the start node; one row
    *         per visited position. walk_id = "start#replica". */
  def walks(edges: DataFrame, srcCol: String, dstCol: String,
            walksPerNode: Int, len: Int, seed: String): DataFrame = {
    require(walksPerNode >= 1 && len >= 1, "walksPerNode and len must be >= 1")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .persist()
    e.count()
    val nodes = e.select(col("src").as("node")).distinct()
    var frontier = nodes
      .select(col("node"), explode(sequence(lit(0), lit(walksPerNode - 1)))
        .as("w"))
      .select(concat(col("node"), lit("#"), col("w")).as("walk_id"),
        col("node").as("cur"))
      .sanitizedCheckpoint()
    val positions = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    positions += frontier.select(col("walk_id"), lit(0).as("step"),
      col("cur").as("node"))
    for (t <- 1 to len) {
      val cand = frontier
        .join(e.withColumnRenamed("src", "cur"), Seq("cur"))
        .select(col("walk_id"), col("dst"),
          TextFunctions.hash64(concat(lit(s"$seed:"), col("walk_id"),
            lit(s":$t:"), col("dst"))).as("h"))
      frontier = cand.groupBy(col("walk_id"))
        .agg(min_by(col("dst"), struct(col("h"), col("dst"))).as("cur"))
        .sanitizedCheckpoint()
      positions += frontier.select(col("walk_id"), lit(t).as("step"),
        col("cur").as("node"))
    }
    val out = positions.reduce(_.unionByName(_))
    e.unpersist(blocking = false)
    out
  }

  /** Skip-gram co-occurrence counts over a walk corpus — the exact
    * pair statistics a graph-embedding trainer (or the PMI scorer)
    * consumes: directed (a, b) counts for every pair within ±window
    * steps of the same walk. One set of lead windows per walk (walks
    * are short — the window sort is per-walk, never global), the same
    * no-positions-self-join shape as
    * [[graft.functions.Vocab.skipgramCounts]] over text. */
  def walkCooccurrence(positions: DataFrame, window: Int): DataFrame = {
    require(window >= 1, "window must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("walk_id")).orderBy(col("step"))
    val withLeads = positions.select(col("node") +:
      (1 to window).map(d => lead(col("node"), d).over(w).as(s"l$d")): _*)
    val prs = withLeads.select(explode(array((1 to window).flatMap { d =>
      Seq(struct(col("node").as("a"), col(s"l$d").as("b")),
        struct(col(s"l$d").as("a"), col("node").as("b")))
    }: _*)).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .where(col("a").isNotNull && col("b").isNotNull)
    prs.groupBy(col("a"), col("b")).agg(count(lit(1)).as("n"))
  }
}
