package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.similarity.KMeans

/** Semantic deduplication (SemDeDup-style): cluster the corpus by
  * embedding with spherical k-means, then inside each cluster drop
  * every point that has a semantic near-duplicate (cosine >=
  * threshold) with a lower id — the minimum-id member of each
  * duplicate neighborhood survives.
  *
  * Why clustering first matters at 100 TB: pairwise cosine over the
  * corpus is O(n²); k-means restricts candidate pairs to points that
  * already share a centroid, so the quadratic term is bounded by the
  * largest cluster, and the cluster count is a tuning knob (SemDeDup
  * uses ~100k clusters at web scale — here k is a parameter). The
  * assignment pass is shuffle-free (centroids broadcast, k rows);
  * only the within-cluster pair join shuffles, keyed by
  * (cluster_id, salt) so a dominant cluster still fans out across
  * the executors (see [[Dedup.embeddingNearDupPairs]]).
  *
  * The keep-rule is deterministic and engine-portable: a point is
  * dropped iff some lower-id point in the same cluster is within the
  * threshold. This is the greedy one-pass rule (not transitive
  * closure): if a~b and b~c but a!~c, both b and c are dropped —
  * each has a lower-id near-dup — which matches the reference
  * SemDeDup behavior of keeping one exemplar per epsilon-ball, not
  * one per connected component. For component semantics, feed the
  * pairs into [[Dedup.duplicateClusters]] instead.
  */
object SemDedup {

  /** Per-point verdict: (id, cluster_id, keep). `keep` is false iff
    * a lower-id point in the same k-means cluster has cosine >=
    * `threshold` with this point. Deterministic seeds
    * ([[KMeans.initCentroids]]: the k lowest ids) keep runs and
    * oracles reproducible. */
  def semDedupVerdicts(points: DataFrame, idCol: String, vecCol: String,
                       k: Int, threshold: Double): DataFrame = {
    val centroids = KMeans.initCentroids(points, idCol, vecCol, k)
    verdictsFromAssigned(points, idCol, vecCol,
      KMeans.assign(points, centroids, idCol, vecCol), threshold)
  }

  /** The shared verdict tail: within-cluster near-dup pairs over an
    * (id, cluster_id) assignment, then keep = "no lower-id near-dup
    * in my cluster". */
  private def verdictsFromAssigned(points: DataFrame, idCol: String,
                                   vecCol: String, assigned: DataFrame,
                                   threshold: Double): DataFrame = {
    val members = points
      .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
      .join(assigned.select(col("id"), col("cluster_id")), Seq("id"))
    val pairs = Dedup.embeddingNearDupPairs(
      members, "id", "v", "cluster_id", threshold)
    // id_b of every surviving pair is dominated by a lower id; the
    // dominated set is duplicate-count-sized, so broadcast the anti side
    val dominated = pairs.select(col("id_b").as("id")).distinct()
    val dom = graft.operators.Spread.freshCol(assigned, "__dom")
    assigned.select(col("id"), col("cluster_id"))
      .join(broadcast(dominated.withColumn(dom, lit(1))), Seq("id"), "left_outer")
      .select(col("id"), col("cluster_id"), col(dom).isNull.as("keep"))
  }

  /** Corpus-size-adaptive cluster count: max(kMin, ceil(√(n/2))).
    *
    * Why √n: the two data-proportional stages pull k in opposite
    * directions — assignment scores n·k point-centroid cosines,
    * the within-cluster pair stage verifies ~n²/(2k) (balanced
    * clusters). Their sum n·k + n²/(2k) is minimized at
    * k* = √(n/2), where total pairwise work is Θ(n^1.5) — against
    * Θ(n²/k) at any FIXED k, which is exactly the quadratic
    * `SCALETEST_r10_x100` measured for q_semdedup (288× at 100×).
    * At 100 TB the next rung is hierarchical assignment (coarse
    * cells first, then children — [[graft.similarity.Similarity]]'s
    * IVF shape), which takes assignment to n·√k; the k policy here
    * is the single-level optimum. */
  def autoK(n: Long, kMin: Int = 8): Int =
    math.max(kMin, math.ceil(math.sqrt(n.toDouble / 2.0)).toInt)

  /** [[semDedupVerdicts]] with k chosen by [[autoK]] from one
    * count() pass. Note the verdict SEMANTICS depend on cluster
    * granularity (SemDeDup drops within-cluster neighbors only), so
    * this is the method's own knob turned to the corpus — the
    * SemDeDup recipe runs ~100k clusters at web scale — not an
    * approximation of the fixed-k result. */
  def semDedupVerdictsAuto(points: DataFrame, idCol: String,
                           vecCol: String, threshold: Double,
                           kMin: Int = 8): DataFrame = {
    val n = points.count()
    semDedupVerdicts(points, idCol, vecCol, autoK(n, kMin), threshold)
  }

  /** [[semDedupVerdicts]] with two-level IVF-shaped assignment
    * ([[KMeans.assignHier]]): per-point assignment cost drops from k
    * to coarseK + k/coarseK cosines (≈ 2√k at the default
    * coarseK = ⌈√k⌉), which is the rung that keeps [[autoK]]'s
    * growing cluster count affordable — at web scale (k ≈ 100k,
    * the SemDeDup recipe) flat assignment alone is n·100k. Cell
    * membership is the standard IVF approximation of the flat
    * argmax (see [[KMeans.assignHier]]); the within-cluster drop
    * rule is unchanged. */
  def semDedupVerdictsHier(points: DataFrame, idCol: String,
                           vecCol: String, k: Int, threshold: Double,
                           coarseK: Int = 0): DataFrame = {
    val ck = if (coarseK > 0) coarseK
      else math.max(1, math.ceil(math.sqrt(k.toDouble)).toInt)
    val centroids = KMeans.initCentroids(points, idCol, vecCol, k)
    verdictsFromAssigned(points, idCol, vecCol,
      KMeans.assignHier(points, centroids, idCol, vecCol, ck), threshold)
  }

  /** [[semDedupVerdictsHier]] at [[autoK]] granularity — the full
    * scale stack: corpus-adaptive cluster count (Θ(n^1.5) total pair
    * work) with two-level assignment (per-point cost 2√k instead of
    * k). One count() pass derives k; coarseK defaults to ⌈√k⌉. */
  def semDedupVerdictsHierAuto(points: DataFrame, idCol: String,
                               vecCol: String, threshold: Double,
                               kMin: Int = 8): DataFrame = {
    val n = points.count()
    semDedupVerdictsHier(points, idCol, vecCol, autoK(n, kMin), threshold)
  }

  /** The reusable half of incremental SemDeDup: the corpus's
    * (id, cluster_id, v) member table — compute once per corpus
    * generation and SAVE it beside the centroid seeds; arriving
    * batches then probe via [[semDedupBatchVerdicts]] without
    * re-assigning the corpus (the [[graft.dedup.SrpDedup.srpIndex]]
    * contract for cluster membership). */
  def semDedupIndex(points: DataFrame, idCol: String, vecCol: String,
                    k: Int): DataFrame = {
    val centroids = KMeans.initCentroids(points, idCol, vecCol, k)
    points
      .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
      .join(KMeans.assign(points, centroids, idCol, vecCol)
        .select(col("id"), col("cluster_id")), Seq("id"))
      .select(col("id"), col("cluster_id"), col("v"))
  }

  /** Incremental SemDeDup: verdicts for a NEW batch against a saved
    * corpus index (disjoint id spaces). A batch point is dropped iff
    * a cosine-≥-threshold neighbor shares its cluster among (a) ANY
    * corpus member — the corpus always wins, matching keep-first
    * exemplar semantics — or (b) a lower-id batch member. Cluster
    * membership comes from the SAME centroid seeds that built the
    * index (passed as `centroids`, an index-lifetime constant like
    * the SRP band geometry); per-batch cost is batch-assignment
    * (|batch|·k) plus the batch × same-cluster join — never a corpus
    * re-assignment. Returns (id, cluster_id, keep) for batch rows. */
  def semDedupBatchVerdicts(batch: DataFrame, index: DataFrame,
                            centroids: DataFrame, idCol: String,
                            vecCol: String, threshold: Double,
                            salt: Int = 8): DataFrame = {
    graft.expressions.GraftFunctions.register(batch.sparkSession)
    val assigned = KMeans.assign(batch, centroids, idCol, vecCol)
    // persisted: read by the corpus probe, the batch self-join (both
    // sides), and the verdict spine
    val members = batch
      .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
      .join(assigned.select(col("id"), col("cluster_id")), Seq("id"))
      .persist()
    val cos = round(call_function(
      graft.expressions.GraftFunctions.Cosine, col("va"), col("vb")), 6)
    // (a) batch × corpus-members-of-the-same-cluster, salted like
    // embeddingNearDupPairs so a dominant cluster fans out
    val a = members.withColumn("salt", pmod(hash(col("id")), lit(salt)))
    val b = index.withColumn("salt", explode(sequence(lit(0), lit(salt - 1))))
    val corpusDominated = a.alias("a")
      .join(b.alias("b"),
        col("a.cluster_id") === col("b.cluster_id") &&
          col("a.salt") === col("b.salt"))
      .select(col("a.id").as("id"), col("a.v").as("va"), col("b.v").as("vb"))
      .where(cos >= threshold)
      .select(col("id")).distinct()
    // (b) lower-id batch near-dups, the in-batch keep-first rule
    val batchDominated = Dedup.embeddingNearDupPairs(
        members, "id", "v", "cluster_id", threshold, salt)
      .select(col("id_b").as("id")).distinct()
    val dominated = corpusDominated.unionByName(batchDominated).distinct()
    val dom = graft.operators.Spread.freshCol(members, "__dom")
    members.select(col("id"), col("cluster_id"))
      .join(broadcast(dominated.withColumn(dom, lit(1))), Seq("id"), "left_outer")
      .select(col("id"), col("cluster_id"), col(dom).isNull.as("keep"))
  }

  /** The deduplicated corpus: rows of `points` whose id survives
    * [[semDedupVerdicts]]. */
  def semDedup(points: DataFrame, idCol: String, vecCol: String,
               k: Int, threshold: Double): DataFrame = {
    val keep = semDedupVerdicts(points, idCol, vecCol, k, threshold)
      .where(col("keep")).select(col("id").as(idCol))
    points.join(keep, Seq(idCol), "left_semi")
  }
}
