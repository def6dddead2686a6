package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Spread
import graft.operators.Converge.SanitizedCheckpoint

/** Distributed spherical k-means over an embedding column (cosine
  * assignment — the metric the rest of the similarity stack uses, and
  * the one whose fused kernel is already a codegen'd expression).
  *
  * Scale design, per Lloyd round:
  *  - ASSIGN: corpus × broadcast(centroids) — k rows broadcast, no
  *    shuffle of the corpus; argmax per point via a window over k rows
  *    (bounded by k, never by corpus size).
  *  - UPDATE: posexplode each assigned vector to (cluster, dim,
  *    component) and groupBy (cluster, dim) — shuffle key cardinality
  *    k×dims, map-side partial aggregation does almost all the work;
  *    the new centroids (k×dims rows) collapse back to arrays with a
  *    bounded collect_list.
  * Initialization is deterministic (the k lowest-id vectors), so runs
  * reproduce across engines and retries — at 100 TB swap in k-means‖
  * sampling, which is also a bounded broadcast.
  */
object KMeans {

  /** Deterministic seed centroids: the k lowest-`idCol` vectors,
    * cluster_id = 0..k-1 in that id order. */
  def initCentroids(df: DataFrame, idCol: String, vecCol: String,
                    k: Int): DataFrame = {
    val w = Window.orderBy(col("cid_src"))
    // TakeOrdered-style: k tiny rows; the global window runs on ≤ k
    // rows after the limit pushes down
    df.select(col(idCol).as("cid_src"),
        col(vecCol).cast("array<double>").as("centroid"))
      .orderBy(col("cid_src")).limit(k)
      .withColumn("cluster_id", row_number().over(w) - 1)
      .select(col("cluster_id"), col("centroid"))
  }

  /** Assign every point to its max-cosine centroid:
    * (id, cluster_id, score). Ties break to the lowest cluster_id. */
  def assign(points: DataFrame, centroids: DataFrame, idCol: String,
             vecCol: String): DataFrame = {
    graft.expressions.GraftFunctions.register(points.sparkSession)
    val p = Spread.ensure(points.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v")))
    val scored = p.join(broadcast(centroids))
      .select(col("id"), col("cluster_id"),
        round(call_function(graft.expressions.GraftFunctions.Cosine,
          col("v"), col("centroid")), 6).as("score"))
    val best = Window.partitionBy(col("id"))
      .orderBy(col("score").desc, col("cluster_id"))
    scored.withColumn("rn", row_number().over(best))
      .where(col("rn") === 1).drop("rn")
  }

  /** Two-level (IVF-shaped) assignment — the scale rung above
    * [[assign]]: each point scores the `coarseK` COARSE centroids
    * first, then only the fine centroids routed to its best coarse
    * cell. Per-point scoring cost drops from k to
    * coarseK + k/coarseK (≈ 2√k at coarseK = √k) — at the SemDeDup
    * recipe's web-scale k ≈ 100k that is ~632 cosines per point
    * instead of 100k, which is what makes corpus-adaptive cluster
    * counts affordable in the first place.
    *
    * Determinism (what an oracle replays): coarse centroids are the
    * fine centroids with `cluster_id < coarseK` (the lowest-id seeds,
    * already deterministic); every scoring stage rounds to 6 places
    * and breaks ties to the lowest id, exactly like [[assign]].
    * Routing fine → coarse is a k × coarseK broadcast product —
    * driver-bounded, never corpus-bounded. The assignment is the
    * standard IVF approximation of the flat argmax: a point whose
    * true best fine cell routes to a different coarse cell than the
    * point itself can be assigned elsewhere — the documented IVF
    * trade, NOT an approximation bug; [[assign]] remains the exact
    * single-level form. Returns (id, cluster_id, score) with
    * cluster_id the FINE cell. */
  def assignHier(points: DataFrame, centroids: DataFrame, idCol: String,
                 vecCol: String, coarseK: Int): DataFrame = {
    require(coarseK >= 1, s"coarseK must be >= 1: $coarseK")
    graft.expressions.GraftFunctions.register(points.sparkSession)
    // k tiny rows read three times (coarse subset, routing, scoring):
    // checkpoint once so the seed scan doesn't recompute per use
    val cents = centroids.sanitizedCheckpoint()
    val coarse = cents.where(col("cluster_id") < coarseK)
      .select(col("cluster_id").as("coarse_id"), col("centroid").as("cv"))
    val cos = (a: String, b: String) => round(call_function(
      graft.expressions.GraftFunctions.Cosine, col(a), col(b)), 6)
    // fine centroid -> its coarse cell (k x coarseK, driver-scale)
    val routeBest = Window.partitionBy(col("cluster_id"))
      .orderBy(col("rscore").desc, col("coarse_id"))
    val route = cents.join(broadcast(coarse))
      .select(col("cluster_id"), col("coarse_id"), col("centroid"),
        cos("centroid", "cv").as("rscore"))
      .withColumn("rn", row_number().over(routeBest))
      .where(col("rn") === 1)
      .select(col("coarse_id"), col("cluster_id"), col("centroid"))
    // point -> coarse cell (n x coarseK)
    val p = Spread.ensure(points.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v")))
    val coarseBest = Window.partitionBy(col("id"))
      .orderBy(col("cscore").desc, col("coarse_id"))
    val pc = p.join(broadcast(coarse))
      .select(col("id"), col("v"), col("coarse_id"),
        cos("v", "cv").as("cscore"))
      .withColumn("rn", row_number().over(coarseBest))
      .where(col("rn") === 1)
      .select(col("id"), col("v"), col("coarse_id"))
    // point -> fine cell within its coarse cell (n x k/coarseK avg)
    val fineBest = Window.partitionBy(col("id"))
      .orderBy(col("score").desc, col("cluster_id"))
    pc.join(broadcast(route), Seq("coarse_id"))
      .select(col("id"), col("cluster_id"),
        cos("v", "centroid").as("score"))
      .withColumn("rn", row_number().over(fineBest))
      .where(col("rn") === 1).drop("rn")
  }

  /** Top-`n` centroid assignment per point — the probe list for
    * multi-probe IVF ([[Similarity.multiProbeKnn]]). Same scoring and
    * tie-break as [[assign]] (n = 1 is exactly `assign`). */
  def assignTopN(points: DataFrame, centroids: DataFrame, idCol: String,
                 vecCol: String, n: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1: $n")
    graft.expressions.GraftFunctions.register(points.sparkSession)
    val p = Spread.ensure(points.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v")))
    val scored = p.join(broadcast(centroids))
      .select(col("id"), col("cluster_id"),
        round(call_function(graft.expressions.GraftFunctions.Cosine,
          col("v"), col("centroid")), 6).as("score"))
    val best = Window.partitionBy(col("id"))
      .orderBy(col("score").desc, col("cluster_id"))
    scored.withColumn("rn", row_number().over(best))
      .where(col("rn") <= n).drop("rn")
  }

  /** Per-cluster simplified (centroid-based) silhouette — the
    * cluster-quality measurement that validates a granularity choice
    * (e.g. [[graft.dedup.SemDedup.autoK]]) BEFORE a full-corpus run.
    * Per point: a = cosine distance to its own centroid, b = distance
    * to the best OTHER centroid, s = (b−a)/max(a,b) ∈ [−1, 1]; since
    * the score window already orders centroids by cosine, a and b
    * are just the rn=1 and rn=2 rows — O(n·k) scoring total, no
    * pairwise term anywhere (the classic silhouette's O(n²) member
    * distances are replaced by centroid distances, the standard
    * scalable form). Exactness contract: scores rounded to 6 places,
    * s floored to ppm, per-cluster mean = integer sum div count —
    * bit-stable and oracle-replayable. Requires k ≥ 2. Returns
    * (cluster_id, n, mean_sil_ppm), one row per non-empty cluster. */
  def silhouetteByCluster(points: DataFrame, centroids: DataFrame,
                          idCol: String, vecCol: String): DataFrame = {
    // cheap limit(2) cardinality probe: with one centroid there is no
    // "best other" (s2 is null) and every downstream mean is garbage
    require(centroids.limit(2).count() >= 2,
      "silhouetteByCluster requires k >= 2 centroids")
    graft.expressions.GraftFunctions.register(points.sparkSession)
    val p = Spread.ensure(points.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v")))
    val scored = p.join(broadcast(centroids))
      .select(col("id"), col("cluster_id"),
        round(call_function(graft.expressions.GraftFunctions.Cosine,
          col("v"), col("centroid")), 6).as("score"))
    val best = Window.partitionBy(col("id"))
      .orderBy(col("score").desc, col("cluster_id"))
    val two = scored.withColumn("rn", row_number().over(best))
      .where(col("rn") <= 2)
    val wide = two.groupBy(col("id")).agg(
      max(when(col("rn") === 1, col("cluster_id"))).as("cluster_id"),
      max(when(col("rn") === 1, col("score"))).as("s1"),
      max(when(col("rn") === 2, col("score"))).as("s2"))
    val a = lit(1.0d) - col("s1")
    val b = lit(1.0d) - col("s2")
    val sil = wide.withColumn("sil_ppm",
      when(greatest(a, b) <= lit(0.0d), lit(0L))
        .otherwise(floor((col("s1") - col("s2")) / greatest(a, b)
          * lit(1000000.0d)).cast("long")))
    sil.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n"),
        expr("CAST(sum(sil_ppm) div count(1) AS BIGINT)")
          .as("mean_sil_ppm"))
  }

  /** One Lloyd update: mean vector of each cluster's members, as
    * (cluster_id, dim, mean) rows — the distributed-friendly long
    * form (shuffle key (cluster, dim), partial agg map-side).
    *
    * Components are quantized to 2^-20 fixed-point BEFORE summing:
    * integer sums are exact and order-independent, so the result is
    * bit-stable under any partial-aggregation schedule (a raw double
    * sum is not) and reproducible in any oracle engine. */
  def lloydMeansLong(points: DataFrame, centroids: DataFrame, idCol: String,
                     vecCol: String, scaleBits: Int = 20): DataFrame = {
    val scale = 1L << scaleBits
    val assigned = assign(points, centroids, idCol, vecCol)
    val p = points.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))
    assigned.join(p, Seq("id"))
      .select(col("cluster_id"), posexplode(col("v")))
      .select(col("cluster_id"), col("pos").as("dim"),
        floor(col("col") * scale).cast("long").as("q"))
      .groupBy(col("cluster_id"), col("dim"))
      .agg(count(lit(1)).as("n"), sum(col("q")).as("qsum"))
      .select(col("cluster_id"), col("dim"), col("n"),
        round(col("qsum").cast("double") / (col("n") * scale), 6)
          .as("mean"))
  }

  /** Collapse lloydMeansLong back to centroid arrays for the next
    * round. */
  private def meansToCentroids(means: DataFrame): DataFrame =
    means.groupBy(col("cluster_id"))
      .agg(array_sort(collect_list(struct(col("dim"), col("mean"))))
        .as("dm"))
      .select(col("cluster_id"),
        expr("transform(dm, x -> x.mean)").as("centroid"))

  /** Full fit: `iters` Lloyd rounds from the deterministic seed.
    * Returns the final (cluster_id, centroid). Each round's centroid
    * set is k×dims values — driver-bounded, safe to keep unpersisted
    * because the next round's broadcast materializes it once. */
  def fit(df: DataFrame, idCol: String, vecCol: String, k: Int,
          iters: Int): DataFrame = {
    var centroids = initCentroids(df, idCol, vecCol, k)
    for (_ <- 0 until iters) {
      // localCheckpoint: k tiny rows, truncates the per-round lineage
      // so plan depth doesn't grow with iterations
      centroids = meansToCentroids(
        lloydMeansLong(df, centroids, idCol, vecCol)).sanitizedCheckpoint()
    }
    centroids
  }
}
