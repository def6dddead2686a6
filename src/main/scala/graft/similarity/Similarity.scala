package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.hash64
import graft.operators.Spread

/** Approximate-nearest-neighbor search over embedding columns
  * (`array<float>`/`array<double>`).
  *
  * - `bruteForceKnn` is the exactness baseline: queries × corpus with
  *   the small query side broadcast, ranked per query by a window.
  * - `partitionedKnn` is the scale path (IVF-style): restrict the
  *   search to a coarse cell (precomputed cluster label), so the join
  *   shuffles by cell instead of producing a full cross product.
  * - `lshBucketKnn` buckets by random-hyperplane SimHash signs with
  *   deterministic md5-derived planes — no fitted model needed, same
  *   buckets in any engine.
  *
  * All arithmetic is done in double after an explicit cast; the dot
  * product is a sequential fold in element order (deterministic).
  */
object Similarity {

  /** Cosine similarity of two numeric arrays (as doubles). */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (s, x) => s + x)
    val na = sqrt(aggregate(transform(a, x => x * x), lit(0.0d), (s, x) => s + x))
    val nb = sqrt(aggregate(transform(b, x => x * x), lit(0.0d), (s, x) => s + x))
    when(na === 0 || nb === 0, lit(0.0)).otherwise(dot / (na * nb))
  }

  /** Exact top-k cosine neighbors for each query vector.
    * `queries`/`corpus`: (id, vec). Self-matches (same id) excluded. */
  def bruteForceKnn(corpus: DataFrame, queries: DataFrame, idCol: String,
                    vecCol: String, k: Int): DataFrame = {
    graft.expressions.GraftFunctions.register(corpus.sparkSession)
    val c = Spread.ensure(corpus.select(col(idCol).as("nbr_id"),
      col(vecCol).cast("array<double>").as("nv")))
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("nbr_id"))
      .select(col("query_id"), col("nbr_id"),
        round(call_function(graft.expressions.GraftFunctions.Cosine,
          col("qv"), col("nv")), 6).as("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("nbr_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** TRUNCATE-THEN-RERANK top-k — the Matryoshka serving pattern
    * (Kusupati et al., "Matryoshka Representation Learning", NeurIPS
    * 2022 §4: MRL-trained embeddings keep most of their signal in a
    * PREFIX of the dimensions, so the shortlist scan runs on the
    * first `dPrefix` dims and only `candidates` rows per query pay
    * the full-dimension similarity). At 100 TB this is the
    * funnel-retrieval shape even without MRL training: the truncated
    * corpus is dims/dPrefix× smaller to store AND scan, the rerank
    * is Q·C full-width — both stages brute-force-exact over their
    * inputs, so the whole operator is deterministic (round-6 cosine,
    * ties to the lowest id at BOTH cuts) and oracle-replayable.
    * Returns (query_id, nbr_id, score, rank) — `score` is the exact
    * FULL-width cosine. */
  def truncatedRerankKnn(corpus: DataFrame, queries: DataFrame,
                         idCol: String, vecCol: String, dPrefix: Int,
                         candidates: Int, k: Int): DataFrame = {
    require(dPrefix >= 1 && candidates >= k,
      s"need dPrefix >= 1 and candidates >= k: $dPrefix, $candidates, $k")
    graft.expressions.GraftFunctions.register(corpus.sparkSession)
    val c = Spread.ensure(corpus.select(col(idCol).as("nbr_id"),
      col(vecCol).cast("array<double>").as("nv")))
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"))
    // stage 1: prefix-width shortlist (deterministic cut). The Q×N
    // frame carries ONLY (query_id, nbr_id, truncated score) — the
    // funnel's whole point is that the wide scan touches dPrefix of
    // the dims, so the full-width vectors must not ride through its
    // window shuffle (they re-join below for the C survivors only,
    // the bqRerankTopK/sq8AdcTopK discipline).
    val coarse = c
      .select(col("nbr_id"), slice(col("nv"), 1, dPrefix).as("ntv"))
      .join(broadcast(q.select(col("query_id"),
          slice(col("qv"), 1, dPrefix).as("qtv"))),
        col("query_id") =!= col("nbr_id"))
      .select(col("query_id"), col("nbr_id"),
        round(call_function(graft.expressions.GraftFunctions.Cosine,
          col("qtv"), col("ntv")), 6).as("tscore"))
    val wc = Window.partitionBy(col("query_id"))
      .orderBy(col("tscore").desc, col("nbr_id"))
    val shortlist = coarse.withColumn("crank", row_number().over(wc))
      .where(col("crank") <= candidates)
      .select(col("query_id"), col("nbr_id"))
    // stage 2: exact full-width rerank of the C survivors
    val wr = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("nbr_id"))
    shortlist.join(c, Seq("nbr_id")).join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("nbr_id"),
        round(call_function(graft.expressions.GraftFunctions.Cosine,
          col("qv"), col("nv")), 6).as("score"))
      .withColumn("rank", row_number().over(wr).cast("long"))
      .where(col("rank") <= k)
  }

  /** Cell-restricted Matryoshka funnel — [[truncatedRerankKnn]]
    * composed with IVF cells (the `sq8AdcTopKByCell` shape at the
    * prefix index): the truncated corpus carries its coarse cell and
    * the stage-1 scan is an EQUI-join on the cell key against the
    * broadcast (query, probed cell, prefix) frame — the prefix index
    * is dims/dPrefix× smaller AND the scan touches only
    * ~nprobe/cells of it, the two multiplicative reductions a 100 TB
    * serving tier stacks. Probe rows per query are distinct cells
    * and a corpus row lives in one cell, so candidates stay disjoint;
    * both cuts and the exact full-width rerank are the flat funnel's
    * contract verbatim. `corpus` carries (idCol, vecCol, cellCol);
    * `queries` one row per (query, probed cell) with the RAW
    * vector. */
  def truncatedRerankKnnByCell(corpus: DataFrame, queries: DataFrame,
                               idCol: String, vecCol: String,
                               cellCol: String, dPrefix: Int,
                               candidates: Int, k: Int): DataFrame = {
    require(dPrefix >= 1 && candidates >= k,
      s"need dPrefix >= 1 and candidates >= k: $dPrefix, $candidates, $k")
    graft.expressions.GraftFunctions.register(corpus.sparkSession)
    val c = Spread.ensure(corpus.select(col(idCol).as("nbr_id"),
      col(cellCol).as("cell"),
      col(vecCol).cast("array<double>").as("nv")))
    val q = queries.select(col(idCol).as("query_id"),
      col(cellCol).as("cell"),
      col(vecCol).cast("array<double>").as("qv"))
    val coarse = c
      .select(col("nbr_id"), col("cell"),
        slice(col("nv"), 1, dPrefix).as("ntv"))
      .join(broadcast(q.select(col("query_id"), col("cell"),
          slice(col("qv"), 1, dPrefix).as("qtv"))), Seq("cell"))
      .where(col("query_id") =!= col("nbr_id"))
      .select(col("query_id"), col("nbr_id"),
        round(call_function(graft.expressions.GraftFunctions.Cosine,
          col("qtv"), col("ntv")), 6).as("tscore"))
    val wc = Window.partitionBy(col("query_id"))
      .orderBy(col("tscore").desc, col("nbr_id"))
    val shortlist = coarse.withColumn("crank", row_number().over(wc))
      .where(col("crank") <= candidates)
      .select(col("query_id"), col("nbr_id"))
    val wr = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("nbr_id"))
    shortlist
      .join(c.select(col("nbr_id"), col("nv")), Seq("nbr_id"))
      .join(broadcast(q.select(col("query_id"), col("qv"))
        .dropDuplicates("query_id")), Seq("query_id"))
      .select(col("query_id"), col("nbr_id"),
        round(call_function(graft.expressions.GraftFunctions.Cosine,
          col("qv"), col("nv")), 6).as("score"))
      .withColumn("rank", row_number().over(wr).cast("long"))
      .where(col("rank") <= k)
  }

  /** IVF-style top-k: only corpus rows in the same coarse cell as the
    * query are scored. `cellCol` is the precomputed cluster label. */
  def partitionedKnn(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, cellCol: String, k: Int): DataFrame = {
    graft.expressions.GraftFunctions.register(corpus.sparkSession)
    val c = Spread.ensure(corpus.select(col(cellCol).as("cell"),
      col(idCol).as("nbr_id"), col(vecCol).cast("array<double>").as("nv")))
    val q = queries.select(col(cellCol).as("cell"), col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"))
    val scored = c.join(broadcast(q), Seq("cell"))
      .where(col("query_id") =!= col("nbr_id"))
      .select(col("query_id"), col("nbr_id"),
        round(call_function(graft.expressions.GraftFunctions.Cosine,
          col("qv"), col("nv")), 6).as("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("nbr_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Contrastive-pair mining signal: for each query vector, the best
    * same-label cosine (hardest positive ceiling) and the best
    * different-label cosine (hardest negative) over the corpus, plus
    * their margin. A small (or negative) margin marks the queries
    * whose nearest impostor outranks their nearest true neighbor —
    * exactly the rows worth showing a contrastive trainer.
    *
    * This is the exactness baseline: queries broadcast, ONE pass over
    * the corpus, both extrema taken in the same aggregation (no
    * window, no second scan). The scale path mines negatives inside
    * coarse cells via [[partitionedKnn]] over a label-excluding
    * filter. Queries whose label has no other corpus member report a
    * null `pos_sim`/`margin` rather than a fabricated score. */
  def contrastiveMargins(corpus: DataFrame, queries: DataFrame,
                         idCol: String, vecCol: String,
                         labelCol: String): DataFrame = {
    graft.expressions.GraftFunctions.register(corpus.sparkSession)
    val c = Spread.ensure(corpus.select(col(idCol).as("nbr_id"),
      col(labelCol).as("nbr_label"),
      col(vecCol).cast("array<double>").as("nv")))
    val q = queries.select(col(idCol).as("query_id"),
      col(labelCol).as("q_label"), col(vecCol).cast("array<double>").as("qv"))
    val sim = call_function(graft.expressions.GraftFunctions.Cosine,
      col("qv"), col("nv"))
    c.join(broadcast(q), col("query_id") =!= col("nbr_id"))
      .groupBy(col("query_id"), col("q_label").as("label"))
      .agg(
        round(max(when(col("nbr_label") === col("q_label"), sim)), 6)
          .as("pos_sim"),
        round(max(when(col("nbr_label") =!= col("q_label"), sim)), 6)
          .as("neg_sim"))
      .withColumn("margin", round(col("pos_sim") - col("neg_sim"), 6))
  }

  /** Multi-probe IVF top-k: each query searches its `nprobe` nearest
    * centroid cells instead of only its own — THE recall lever for
    * cell-restricted ANN (a uniform query's true neighbor sits just
    * across a cell boundary with probability ≈ 1 − 1/nprobe·…; probing
    * 2-4 cells recovers most of it for a 2-4× candidate cost, still
    * orders of magnitude under the cross product). The probe list
    * replicates only QUERY rows (queries ≪ corpus); the search join
    * stays a cell-keyed equi-join, corpus rows never replicate. */
  def multiProbeKnn(corpus: DataFrame, queries: DataFrame,
                    centroids: DataFrame, idCol: String, vecCol: String,
                    cellCol: String, k: Int, nprobe: Int): DataFrame = {
    graft.expressions.GraftFunctions.register(corpus.sparkSession)
    val c = Spread.ensure(corpus.select(col(cellCol).as("cell"),
      col(idCol).as("nbr_id"), col(vecCol).cast("array<double>").as("nv")))
    val probes = KMeans.assignTopN(queries, centroids, idCol, vecCol,
        nprobe)
      .select(col("id").as("query_id"), col("cluster_id").as("cell"))
    val q = queries.select(col(idCol).as("query_id"),
        col(vecCol).cast("array<double>").as("qv"))
      .join(probes, Seq("query_id"))
    val scored = c.join(broadcast(q), Seq("cell"))
      .where(col("query_id") =!= col("nbr_id"))
      .select(col("query_id"), col("nbr_id"),
        round(call_function(graft.expressions.GraftFunctions.Cosine,
          col("qv"), col("nv")), 6).as("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("nbr_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Deterministic random-hyperplane weights: planes × dims, derived
    * from md5 so buckets reproduce anywhere. Values in [-0.5, 0.5).
    * Exposed package-wide so the oracle SQL can inline the same
    * literals. */
  private[graft] def planeWeight(plane: Int, dim: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"plane:$plane:$dim".getBytes("UTF-8"))
    val v = java.lang.Long.parseLong(
      md.take(7).map("%02x".format(_)).mkString, 16)
    (v % 100000L) / 100000.0 - 0.5
  }

  /** Sign-bucket id for a vector under `planes` hyperplanes. */
  def lshBucket(vec: Column, planes: Int, dims: Int): Column = {
    val bits: Seq[Column] = (0 until planes).map { p =>
      val ws = array((0 until dims).map(d => lit(planeWeight(p, d))): _*)
      val dot = aggregate(zip_with(vec, ws, (x, w) => x * w), lit(0.0d), (s, x) => s + x)
      when(dot > 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** ANN top-k searching only the query's LSH bucket. Trades recall
    * for a bucket-equi-join (shuffle by bucket, no cross product). */
  def lshBucketKnn(corpus: DataFrame, queries: DataFrame, idCol: String,
                   vecCol: String, k: Int, planes: Int, dims: Int): DataFrame = {
    graft.expressions.GraftFunctions.register(corpus.sparkSession)
    val c = Spread.ensure(corpus.select(col(idCol).as("nbr_id"),
        col(vecCol).cast("array<double>").as("nv")))
      .select(lshBucket(col("nv"), planes, dims).as("bucket"),
        col("nbr_id"), col("nv"))
    val q = queries.select(
      lshBucket(col(vecCol).cast("array<double>"), planes, dims).as("bucket"),
      col(idCol).as("query_id"), col(vecCol).cast("array<double>").as("qv"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .where(col("query_id") =!= col("nbr_id"))
      .select(col("query_id"), col("nbr_id"),
        round(call_function(graft.expressions.GraftFunctions.Cosine,
          col("qv"), col("nv")), 6).as("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("nbr_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** ANN evaluation — recall@k of an approximate top-k result
    * against the exact (brute-force) top-k, per query: the "measure,
    * don't guess" companion to every cell/bucket-restricted search
    * above. A sampled query set's recall is what decides nprobe /
    * cell count / plane count BEFORE a full-corpus run commits to
    * them.
    *
    * Both inputs are (query_id, nbr_id, …) top-k frames, so rows are
    * already k-bounded per query — the semi-join and counts are
    * trivially small at any corpus scale. Returns (query_id,
    * n_exact, n_hit, recall_ppm) with recall in exact floor-divided
    * ppm; queries absent from `approx` (empty cell, missed bucket)
    * report zero hits rather than disappearing. */
  def recallAtK(approx: DataFrame, exact: DataFrame): DataFrame = {
    val a = approx.select(col("query_id"), col("nbr_id"))
    val e = exact.select(col("query_id"), col("nbr_id"))
    val hits = e.join(a, Seq("query_id", "nbr_id"), "left_semi")
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_hit"))
    e.groupBy(col("query_id")).agg(count(lit(1)).as("n_exact"))
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"), col("n_exact"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"))
      .withColumn("recall_ppm", expr("(1000000 * n_hit) div n_exact"))
  }
}
