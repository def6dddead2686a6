package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Converge.SanitizedCheckpoint

/** Incremental triangle maintenance: when a batch of edges lands on
  * an existing graph, recounting every triangle (q_triangles) pays
  * the full wedge enumeration again — but every triangle the batch
  * CREATES contains at least one batch edge, so the new triangles are
  * exactly the common-neighbor closures of the batch edges against
  * the updated adjacency. Cost ∝ |Δ|·avg-degree, independent of how
  * many triangles the old graph already had — the graph sibling of
  * `AggMaintain`'s incremental aggregates and `minHashPairsAgainstIndex`'s
  * probe-then-add.
  *
  * A triangle with 2 or 3 batch edges is discovered once per batch
  * edge; the canonical sorted triple is `distinct`-ed before
  * counting, so each new triangle contributes exactly 1 to each of
  * its three corners (matching what full recounts before/after the
  * batch would differ by). All integers → hash-exact.
  */
object TriangleDelta {

  private def canon(df: DataFrame, s: String, d: String): DataFrame =
    df.select(least(col(s), col(d)).as("u"),
        greatest(col(s), col(d)).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()

  /** Per-node counts of triangles CREATED by the batch: triangles of
    * old ∪ batch containing at least one genuinely-new edge.
    * Returns (node_id, delta_triangles); nodes in no new triangle are
    * absent (join with the degree table to zero-fill if needed).
    * Equals `triangleCounts(old ∪ batch) − triangleCounts(old)`
    * corner by corner (spec-verified). */
  def triangleDelta(oldEdges: DataFrame, batchEdges: DataFrame,
                    srcCol: String, dstCol: String): DataFrame = {
    val oldC = canon(oldEdges, srcCol, dstCol).persist()
    val full = oldC.unionByName(canon(batchEdges, srcCol, dstCol))
      .distinct().persist()
    full.count()
    // genuinely-new edges: present after, absent before
    val delta = full.join(oldC, Seq("u", "v"), "left_anti")
    val sym = full.select(explode(array(
        struct(col("u").as("n"), col("v").as("m")),
        struct(col("v").as("n"), col("u").as("m")))).as("p"))
      .select(col("p.n").as("n"), col("p.m").as("m"))
    // third corners: neighbors w of u with (w, v) also an edge —
    // every new triangle has one of its new edges as (u, v) here
    val cand = delta
      .join(sym.select(col("n").as("u"), col("m").as("w")), Seq("u"))
      .where(col("w") =!= col("v"))
      .join(full.select(col("u").as("wu"), col("v").as("wv")),
        least(col("w"), col("v")) === col("wu") &&
          greatest(col("w"), col("v")) === col("wv"),
        "left_semi")
    // canonical triple → exactly-once per triangle
    val triples = cand.select(
        array_sort(array(col("u"), col("v"), col("w"))).as("t"))
      .distinct()
    // eager: the result must outlive the edge caches (a caller
    // looping over batches — the streaming twin — would otherwise
    // accumulate a cache pair per batch)
    val out = triples.select(explode(col("t")).as("node_id"))
      .groupBy(col("node_id"))
      .agg(count(lit(1)).as("delta_triangles"))
      .sanitizedCheckpoint()
    oldC.unpersist(blocking = false)
    full.unpersist(blocking = false)
    out
  }

  /** Per-node counts of triangles DESTROYED by retracting the batch —
    * [[triangleDelta]]'s delete twin (the takedown/opt-out shape at
    * the triangle layer): every triangle the retraction destroys
    * contains at least one deleted-and-present edge, so the destroyed
    * set is exactly the common-neighbor closures of those edges
    * against the ORIGINAL adjacency. Cost ∝ |Δ|·avg-degree, never the
    * old graph's full wedge enumeration. A triangle losing 2 or 3
    * edges is discovered once per lost edge; the canonical sorted
    * triple is `distinct`-ed, so each destroyed triangle contributes
    * exactly 1 to each of its three corners. Returns (node_id,
    * delta_triangles) with nodes in no destroyed triangle absent —
    * equals `triangleCounts(old) − triangleCounts(old ∖ batch)`
    * corner by corner (spec-verified); a batch edge not present in
    * the graph destroys nothing. All integers → hash-exact. */
  def triangleDeltaDeleted(oldEdges: DataFrame, batchEdges: DataFrame,
                           srcCol: String, dstCol: String): DataFrame = {
    val oldC = canon(oldEdges, srcCol, dstCol).persist()
    oldC.count()
    // deleted-and-present edges: a row not in the graph prunes nothing
    val del = canon(batchEdges, srcCol, dstCol)
      .join(oldC, Seq("u", "v"), "left_semi")
    val sym = oldC.select(explode(array(
        struct(col("u").as("n"), col("v").as("m")),
        struct(col("v").as("n"), col("u").as("m")))).as("p"))
      .select(col("p.n").as("n"), col("p.m").as("m"))
    // third corners in the ORIGINAL graph: neighbors w of u with
    // (w, v) also an old edge — every destroyed triangle has one of
    // its deleted edges as (u, v) here
    val cand = del
      .join(sym.select(col("n").as("u"), col("m").as("w")), Seq("u"))
      .where(col("w") =!= col("v"))
      .join(oldC.select(col("u").as("wu"), col("v").as("wv")),
        least(col("w"), col("v")) === col("wu") &&
          greatest(col("w"), col("v")) === col("wv"),
        "left_semi")
    val triples = cand.select(
        array_sort(array(col("u"), col("v"), col("w"))).as("t"))
      .distinct()
    val out = triples.select(explode(col("t")).as("node_id"))
      .groupBy(col("node_id"))
      .agg(count(lit(1)).as("delta_triangles"))
      .sanitizedCheckpoint()
    oldC.unpersist(blocking = false)
    out
  }
}
