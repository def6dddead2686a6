package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triangle counting with DEGREE-ORDERED edge orientation — the
  * classic distributed-scale algorithm (Suri & Vassilvitskii's
  * MR node-iterator++): orient every undirected edge from its
  * lower-(degree, id) endpoint to the higher one, enumerate wedges
  * from each node's ORIENTED out-neighborhood, and close them against
  * the oriented edge set. Each triangle is produced exactly once (its
  * minimum-order corner owns it), and orientation bounds out-degree by
  * O(√m) regardless of hub degree — the naive neighbor join explodes
  * quadratically on a celebrity node; this never does. All joins are
  * node-keyed equi-joins; counts are integers, so results hash-match
  * any engine.
  */
object Triangles {

  /** Per-node triangle participation counts over an undirected edge
    * list (self-loops dropped, duplicate/reversed edges collapsed).
    * Returns (node_id, n_triangles) for every node incident to at
    * least one edge, zeros included.
    *
    * Cache lifecycle: the canonical edge and oriented-edge frames are
    * persisted (each feeds 2-3 joins); the caller owns release via
    * `clearCache` — the Bench/Verify contract used across the dedup
    * operators. */
  def triangleCounts(edges: DataFrame, srcCol: String,
                     dstCol: String): DataFrame = {
    val e = edges
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
      .persist()
    val deg = e.select(col("u").as("n"))
      .unionByName(e.select(col("v").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("dg"))
    // total (degree, id) order; orientation = low endpoint → high.
    // The (dg, id) structs ride along so the wedge join can order the
    // two out-neighbors without re-joining degrees.
    // field names inside the order structs must MATCH (least/greatest
    // require identical struct types), hence the (d, i) aliases
    val ku = struct(col("dgu").as("d"), col("u").as("i"))
    val kv = struct(col("dgv").as("d"), col("v").as("i"))
    val o = e
      .join(deg.select(col("n").as("u"), col("dg").as("dgu")), Seq("u"))
      .join(deg.select(col("n").as("v"), col("dg").as("dgv")), Seq("v"))
      .select(
        when(ku < kv, col("u")).otherwise(col("v")).as("a"),
        when(ku < kv, col("v")).otherwise(col("u")).as("b"),
        least(ku, kv).as("ka"),
        greatest(ku, kv).as("kb"))
      .persist()
    // wedges from each owner a: ordered pairs of out-neighbors
    // (out-degree ≤ O(√m) under this orientation), closed against the
    // oriented edges — (x, y) is oriented x→y exactly when
    // ord(x) < ord(y), which the wedge ordering guarantees
    val w = o.select(col("a"), col("b").as("x"), col("kb").as("kx"))
      .join(o.select(col("a"), col("b").as("y"), col("kb").as("ky")),
        Seq("a"))
      .where(col("kx") < col("ky"))
    val tri = w.join(
      o.select(col("a").as("x"), col("b").as("y")), Seq("x", "y"))
      .select(col("a"), col("x"), col("y"))
    // every corner of every triangle counts once
    val corners = tri.select(col("a").as("n"))
      .unionByName(tri.select(col("x").as("n")))
      .unionByName(tri.select(col("y").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("n_triangles"))
    deg.select(col("n").as("node_id"))
      .join(corners.withColumnRenamed("n", "node_id"), Seq("node_id"), "left")
      .select(col("node_id"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
  }
}
