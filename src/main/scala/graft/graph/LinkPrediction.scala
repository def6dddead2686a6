package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Neighborhood-overlap link prediction: score non-adjacent node
  * pairs at distance 2 by common-neighbor count and Jaccard overlap
  * of their neighborhoods (Liben-Nowell & Kleinberg, "The link
  * prediction problem for social networks", CIKM 2003). Scores are
  * exact integers (Jaccard in ppm fixed point with floor division),
  * so results hash-match any engine.
  *
  * Scale design: candidates are generated as wedges — ordered pairs
  * of neighbors of a shared center — so only genuinely-distance-2
  * pairs ever materialize (never the O(n²) pair space), and the
  * common-neighbor count is a groupBy over wedge endpoints. Every
  * step is an equi-join (center key, then degree lookup, then an
  * anti-join against the edge set to drop already-linked pairs).
  * The wedge count is Σ deg(c)² over centers c — a celebrity hub
  * explodes it quadratically, which is intrinsic to the score (every
  * fan pair IS at distance 2 through the hub). `maxCenterDegree`
  * caps that: centers above the cap contribute no wedges — the
  * standard degreе-capped approximation — documented rather than
  * silent, and OFF by default. Downstream thresholds (`minCommon`)
  * prune the long tail of weak candidates before the degree joins.
  */
object LinkPrediction {

  /** Common-neighbor and Jaccard scores for non-adjacent pairs at
    * distance 2 in an undirected graph (self-loops dropped,
    * duplicate/reversed edges collapsed).
    *
    * @param minCommon        keep pairs with at least this many
    *                         common neighbors (prunes weak
    *                         candidates before the degree joins)
    * @param maxCenterDegree  if set, wedge centers with degree above
    *                         the cap contribute no candidate pairs
    *                         (hub-capped approximation for graphs
    *                         with celebrity nodes)
    * @return (u, v, common_n, jaccard_ppm) with u < v;
    *         jaccard_ppm = 10⁶·|Γu∩Γv| / |Γu∪Γv| floor-divided
    */
  def jaccardCandidates(edges: DataFrame, srcCol: String, dstCol: String,
                        minCommon: Long = 1L,
                        maxCenterDegree: Option[Long] = None): DataFrame = {
    val e = edges
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
      .persist()
    e.count() // adjacency feeds wedges, degrees, and the anti-join
    val sym = e.select(explode(array(
        struct(col("u").as("c"), col("v").as("x")),
        struct(col("v").as("c"), col("u").as("x")))).as("p"))
      .select(col("p.c").as("c"), col("p.x").as("x"))
    val deg = sym.groupBy(col("c")).agg(count(lit(1)).as("dg"))
    val centers = maxCenterDegree match {
      case Some(cap) => sym.join(
        deg.where(col("dg") <= cap).select(col("c")), Seq("c"))
      case None => sym
    }
    // wedges through each center: unordered neighbor pairs (a < b);
    // one row per (pair, shared center) → count = common neighbors
    val common = centers.alias("l")
      .join(centers.alias("r"),
        col("l.c") === col("r.c") && col("l.x") < col("r.x"))
      .select(col("l.x").as("u"), col("r.x").as("v"))
      .groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("common_n"))
      .where(col("common_n") >= minCommon)
    val cand = common.join(e, Seq("u", "v"), "left_anti")
    // cache lifecycle: `e` stays persisted (it feeds the wedge join
    // twice, the degree agg, and the anti-join); the caller owns
    // release via clearCache — the Triangles/Dedup contract
    cand
      .join(deg.select(col("c").as("u"), col("dg").as("du")), Seq("u"))
      .join(deg.select(col("c").as("v"), col("dg").as("dv")), Seq("v"))
      .select(col("u"), col("v"), col("common_n"),
        expr("(1000000 * common_n) div (du + dv - common_n)")
          .as("jaccard_ppm"))
  }
}
