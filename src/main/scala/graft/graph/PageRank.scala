package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank over an edge table, in EXACT fixed-point arithmetic.
  *
  * Classic (non-normalized) formulation: pr(v) = (1−d) + d·Σ_{u→v}
  * pr(u)/outdeg(u), run for a fixed iteration count. All arithmetic is
  * integer (parts-per-million fixed point, floor division), so the
  * result is bit-identical regardless of partitioning, reduction
  * order, or engine — an iterative float PageRank can NEVER be
  * oracle-compared exactly, a fixed-point one can.
  *
  * Scale design: each iteration is one equi-join (edges ⋈ ranks on
  * src) and one groupBy(dst) sum — both shuffle on the node key, so
  * the partitioning is stable across iterations and AQE reuses the
  * layout; rank state is one row per node (tiny next to the edge
  * table) and broadcasts when small. Iterations are a fixed small
  * constant (PageRank converges geometrically; 3-10 rounds), so plan
  * depth is bounded — for big iteration counts checkpoint every few
  * rounds like `Dedup.duplicateClusters`. Overflow bound: the worst
  * case is a hub receiving the whole rank mass, so damping·Σpr must
  * fit a long: n_nodes · SCALE · DAMPING_PPM < 2⁶³ gives
  * n ≈ 1.1×10⁷ nodes at this scale. Past that the `wide` path moves
  * the per-node contribution sum AND the damping multiply to
  * DECIMAL(38,0) (exact — identical results where both paths are in
  * range), raising the ceiling to a single NODE's rank overflowing a
  * long (total mass n·SCALE ⇒ n ≈ 9×10¹² nodes). By default the path
  * is probed automatically from the (already-materialized) node
  * count.
  */
object PageRank {
  val Scale = 1000000L // 1.0 in ppm fixed point

  /** @param edges  directed edges (srcCol, dstCol); make it symmetric
    *               beforehand for an undirected graph
    * @param wide   Some(b) forces the DECIMAL(38,0) arithmetic on/off;
    *               None (default) probes the node count and widens
    *               exactly when long damping arithmetic could overflow
    * @return (node_id, pr_ppm): rank in ppm fixed point, exact */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int, dampingPpm: Long = 850000L,
               wide: Option[Boolean] = None): DataFrame = {
    require(iters >= 1 && dampingPpm >= 0 && dampingPpm <= Scale)
    // materialize ONE degree-annotated edge table up front: every
    // iteration joins against it, and an unpersisted plan would re-run
    // the whole upstream pipeline (scans, joins, distinct) plus the
    // degree join once per round. Persisting (src, dst, outdeg) keeps
    // each round to a single join + aggregate — and persisting it
    // HASH-PARTITIONED BY dst means each round's groupBy(dst) (and the
    // final node-key join) reuses the cached layout instead of
    // shuffling every edge row again: the rank side broadcasts (AQE,
    // one row per node), so iterations run exchange-free on the big
    // table. One upfront shuffle buys iters × (edge-volume shuffle).
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val ed = e.join(deg, Seq("src")).repartition(col("dst")).persist()
    val edCount = ed.count()
    val nodes = ed.select(col("src").as("node")).distinct().persist()
    // overflow probe: damping·Σpr wraps a long iff the total rank mass
    // n·SCALE exceeds Long.Max/dampingPpm — i.e. n > Long.Max /
    // (dampingPpm·SCALE) (≈1.085×10⁷ at the default damping). The
    // already-materialized edge count bounds n from above (every node
    // is the src of ≥1 edge row), so in-range graphs decide for FREE;
    // only past the bound is the exact (cached-distinct) node count
    // paid — trivial next to a 10⁷-edge iteration.
    val useWide = wide.getOrElse {
      dampingPpm > 0 && {
        val safeNodes = Long.MaxValue / (dampingPpm * Scale)
        edCount > safeNodes && nodes.count() > safeNodes
      }
    }
    val base = lit(Scale - dampingPpm)
    var pr = nodes.select(col("node"), lit(Scale).as("pr_ppm"))
    // deliberately NOT broadcast(pr) per round: an explicit broadcast
    // collects eagerly, so round k's broadcast re-executes rounds
    // 1..k-1 — measured quadratic blowup. Left lazy, all rounds fuse
    // into ONE job at materialization (each operator runs once) and
    // AQE still broadcasts the measured-small rank side inside it.
    for (_ <- 1 to iters) {
      val contrib = ed
        .join(pr.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst"),
          expr("pr_ppm div outdeg").as("c"))
      // wide: sum and damping-multiply in DECIMAL(38,0) — `div` is
      // integral divide on decimals too (returns BIGINT), so floor
      // semantics match the long path exactly for the non-negative
      // values here
      val agg = contrib.groupBy(col("dst")).agg(
        (if (useWide) sum(col("c").cast("decimal(38,0)"))
         else sum(col("c"))).as("s"))
      val damped =
        if (useWide) expr(
          s"cast(($dampingPpm * coalesce(s, cast(0 as decimal(38,0)))) " +
            s"div $Scale as bigint)")
        else expr(s"($dampingPpm * coalesce(s, 0L)) div $Scale")
      pr = nodes
        .join(agg.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .select(col("node"), (base + damped).as("pr_ppm"))
    }
    // materialize the (one-row-per-node) result, then release the two
    // iteration caches — a long-lived session running many queries
    // must not accumulate cached blocks (localCheckpoint keeps the
    // result readable after the unpersist)
    val out = pr.select(col("node").as("node_id"), col("pr_ppm"))
      .localCheckpoint()
    ed.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    out
  }
}
