package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Converge.SanitizedCheckpoint

/** Scalar quantization (SQ8-style) of an embedding column: each
  * dimension gets a corpus-wide [min, max] range and every value maps
  * to an integer code `0..levels-1`. At serving time the codes array
  * is `levels <= 256 ? 1 : 2` bytes per dimension instead of 4-8 — the
  * difference between a 100 TB vector corpus fitting executor memory
  * for ANN re-ranking or not.
  *
  * Everything here is chosen for cross-engine determinism:
  *  - per-dim stats are MIN/MAX (exact selections, unlike a
  *    mean/stddev whose float-sum reduction order varies);
  *  - the code is `floor(t * (levels-1) + 0.5)` — floor is
  *    reduction-order-free and avoids engines' differing round()
  *    tie-breaking (HALF_UP vs HALF_EVEN);
  *  - the stats frame is tiny (one row per dimension) and broadcast,
  *    so the whole encode is scan → broadcast-join → project: one pass
  *    over the corpus, no shuffle of vector data at all.
  *
  * `encode` keeps one row per (vector, dim) for auditing;
  * `auditStats` folds them to a per-vector contract (code checksum +
  * worst reconstruction error) — the shape a 100 TB pipeline persists
  * next to the codes to prove the quantizer's error bound holds.
  */
object Quantize {

  /** Per-dimension corpus ranges: (dim, lo, hi). */
  def dimRanges(corpus: DataFrame, vecCol: String): DataFrame =
    corpus.select(posexplode(col(vecCol).cast("array<double>"))
        .as(Seq("dim", "val")))
      .groupBy(col("dim"))
      .agg(min(col("val")).as("lo"), max(col("val")).as("hi"))

  /** (id, dim, val, code) rows; constant dimensions (lo == hi) encode
    * as 0. `levels` is the number of representable cells (256 = SQ8). */
  def encode(corpus: DataFrame, idCol: String, vecCol: String,
             levels: Int = 256): DataFrame = {
    require(levels >= 2, s"levels must be >= 2: $levels")
    val ranges = dimRanges(corpus, vecCol)
    corpus.select(col(idCol).as("id"),
        posexplode(col(vecCol).cast("array<double>")).as(Seq("dim", "val")))
      .join(broadcast(ranges), Seq("dim"))
      .select(col("id"), col("dim"), col("val"),
        when(col("hi") === col("lo"), lit(0L))
          .otherwise(floor((col("val") - col("lo")) / (col("hi") - col("lo"))
            * (levels - 1) + 0.5).cast("long")).as("code"),
        col("lo"), col("hi"))
  }

  // ---- Product quantization (PQ, Jégou/Douze/Schmid, "Product
  // quantization for nearest neighbor search", TPAMI 2011) ----------
  //
  // Where SQ8 quantizes each DIMENSION independently (m = dims,
  // 1 byte each), PQ splits the vector into m contiguous SUBVECTORS
  // and quantizes each against its own k-codeword codebook: m bytes
  // per vector at k ≤ 256 — 64 dims × 8 bytes → 4 bytes at m = 4.
  // Search runs on the CODES (asymmetric distance computation, ADC):
  // a query precomputes one m×k lookup table of subvector inner
  // products, and every corpus vector scores as m table lookups + a
  // sum — no corpus vector is ever decoded. That is the 100 TB ANN
  // shape: the vector corpus compresses ~64×, the scan touches only
  // (id, sub, code) rows, and the per-query work is a broadcast LUT.
  //
  // Determinism contract (the q_knn_ivf_learned discipline):
  // codebooks are the SEED codewords — the k lowest-id vectors'
  // subvector slices, KMeans.initCentroids applied per subspace — so
  // an oracle replays them verbatim (KMeans.fit slots in where no
  // oracle is needed; the assignment/ADC machinery is identical);
  // encode assignment is argmax cosine rounded to 6 places, ties to
  // the lowest code (KMeans.assign semantics, per subvector); LUT
  // entries are ⌊dot·10⁶ + 0.5⌋ as BIGINT (the SQ8 floor form — no
  // engine round() tie-break surface), so the ADC score is an exact
  // INTEGER sum, reduction-order-free.

  /** Seed PQ codebooks: (sub, code, centroid) for sub = 0..m−1 and
    * code = 0..k−1, where centroid is the sub-th slice of the code-th
    * lowest-`idCol` vector. Requires dims divisible by m. */
  def pqCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
                  m: Int, k: Int, dims: Int): DataFrame = {
    require(m >= 1 && dims % m == 0,
      s"dims ($dims) must divide into m ($m) subvectors")
    val subDim = dims / m
    val seeds = KMeans.initCentroids(corpus, idCol, vecCol, k)
    seeds.select(col("cluster_id").as("code"),
        explode(expr(s"transform(sequence(0, ${m - 1}), " +
          s"s -> struct(s AS sub, slice(centroid, s * $subDim + 1, $subDim) " +
          "AS centroid))")).as("e"))
      .select(col("e.sub").as("sub"), col("code"), col("e.centroid"))
  }

  /** Lloyd-REFINED PQ codebooks — the production quantizer over the
    * [[pqCodebooks]] seed (Jégou et al. §III train k-means per
    * subspace): all m subspaces refine in the SAME jobs over one
    * exploded (id, sub, sv) frame, so an iteration costs one corpus
    * pass × broadcast(m·k codewords) for the assignment plus one
    * (sub, code, dim)-keyed partial-agg for the update — never m
    * sequential fits. Codewords that attract no members keep their
    * previous centroid (deterministic, and the standard dead-centroid
    * fallback at this scale).
    *
    * Determinism is the [[KMeans.lloydMeansLong]] contract applied
    * per subspace: assignment = argmax cosine rounded to 6, ties to
    * the lowest code; update components quantize to 2^-`scaleBits`
    * fixed point BEFORE summing (integer sums are exact and
    * order-independent) and the mean rounds to 6 — bit-stable under
    * any partial-agg schedule and replayable by an unrolled oracle,
    * which is what lets the trained-recall gate hash-match. */
  def pqCodebooksTrained(corpus: DataFrame, idCol: String, vecCol: String,
                         m: Int, k: Int, dims: Int, iters: Int,
                         scaleBits: Int = 20): DataFrame = {
    require(iters >= 0, s"iters must be >= 0: $iters")
    val subDim = dims / m
    val scale = 1L << scaleBits
    graft.expressions.GraftFunctions.register(corpus.sparkSession)
    val subs = graft.operators.Spread.ensure(
      corpus.select(col(idCol).as("id"),
        col(vecCol).cast("array<double>").as("v")))
      .select(col("id"), explode(expr(s"transform(sequence(0, ${m - 1}), " +
        s"s -> struct(s AS sub, slice(v, s * $subDim + 1, $subDim) AS sv))"))
        .as("e"))
      .select(col("id"), col("e.sub").as("sub"), col("e.sv").as("sv"))
      .persist()
    subs.count() // iters+0 reads per round; materialize once
    var cb = pqCodebooks(corpus, idCol, vecCol, m, k, dims)
      .sanitizedCheckpoint() // m·k tiny rows; truncate per-round lineage
    try {
      for (_ <- 0 until iters) {
        // ASSIGN, carrying sv through the window so the update needs
        // no second corpus join
        val scored = subs.join(broadcast(cb), Seq("sub"))
          .select(col("id"), col("sub"), col("code"), col("sv"),
            round(call_function(graft.expressions.GraftFunctions.Cosine,
              col("sv"), col("centroid")), 6).as("score"))
        val best = org.apache.spark.sql.expressions.Window
          .partitionBy(col("id"), col("sub"))
          .orderBy(col("score").desc, col("code"))
        val assigned = scored.withColumn("rn", row_number().over(best))
          .where(col("rn") === 1)
          .select(col("sub"), col("code"), col("sv"))
        // UPDATE: exact fixed-point mean per (sub, code, dim) —
        // shuffle key cardinality m·k·subDim, map-side partials
        val means = assigned
          .select(col("sub"), col("code"), posexplode(col("sv")))
          .select(col("sub"), col("code"), col("pos").as("dim"),
            floor(col("col") * scale).cast("long").as("q"))
          .groupBy(col("sub"), col("code"), col("dim"))
          .agg(count(lit(1)).as("n"), sum(col("q")).as("qsum"))
          .select(col("sub"), col("code"), col("dim"),
            round(col("qsum").cast("double") / (col("n") * scale), 6)
              .as("mean"))
        val upd = means.groupBy(col("sub"), col("code"))
          .agg(array_sort(collect_list(struct(col("dim"), col("mean"))))
            .as("dm"))
          .select(col("sub"), col("code"),
            expr("transform(dm, x -> x.mean)").as("centroid"))
        cb = cb.select(col("sub"), col("code"), col("centroid").as("prev"))
          .join(upd, Seq("sub", "code"), "left")
          .select(col("sub"), col("code"),
            coalesce(col("centroid"), col("prev")).as("centroid"))
          .sanitizedCheckpoint()
      }
      cb
    } finally subs.unpersist()
  }

  /** PQ-encode the corpus: (id, sub, code) — per subvector the
    * argmax-cosine codeword (round 6, ties to the lowest code), the
    * KMeans.assign contract applied per subspace. One corpus pass ×
    * broadcast(m·k codewords); the codes table is the m-bytes-per-
    * vector artifact a 100 TB pipeline persists instead of vectors. */
  def pqEncode(corpus: DataFrame, idCol: String, vecCol: String,
               codebooks: DataFrame, m: Int, dims: Int): DataFrame = {
    val subDim = dims / m
    graft.expressions.GraftFunctions.register(corpus.sparkSession)
    val subs = graft.operators.Spread.ensure(
      corpus.select(col(idCol).as("id"),
        col(vecCol).cast("array<double>").as("v")))
      .select(col("id"), explode(expr(s"transform(sequence(0, ${m - 1}), " +
        s"s -> struct(s AS sub, slice(v, s * $subDim + 1, $subDim) AS sv))"))
        .as("e"))
      .select(col("id"), col("e.sub").as("sub"), col("e.sv").as("sv"))
    val scored = subs.join(broadcast(codebooks), Seq("sub"))
      .select(col("id"), col("sub"), col("code"),
        round(call_function(graft.expressions.GraftFunctions.Cosine,
          col("sv"), col("centroid")), 6).as("score"))
    val best = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id"), col("sub"))
      .orderBy(col("score").desc, col("code"))
    scored.withColumn("rn", row_number().over(best))
      .where(col("rn") === 1)
      .select(col("id"), col("sub"), col("code"))
  }

  /** ADC top-k over PQ codes: each query precomputes the m×k LUT of
    * subvector inner products in exact micro-units
    * (⌊dot·10⁶ + 0.5⌋ as BIGINT), every corpus vector scores as m
    * lookups + an integer sum (approximate inner product — MIPS), and
    * the top `k` by (score desc, id asc) return per query, self
    * excluded. The join is (sub, code)-keyed against the broadcast
    * LUT — corpus VECTORS are never touched. Returns
    * (query_id, nbr_id, score_u, rank). */
  def pqAdcTopK(codes: DataFrame, queries: DataFrame, idCol: String,
                vecCol: String, codebooks: DataFrame, m: Int, dims: Int,
                k: Int): DataFrame =
    adcTopK(codes, queries, idCol, vecCol, None, codebooks, m, dims, k)

  /** Cell-restricted ADC — the IVF-PQ composition (the FAISS serving
    * shape): `codes` carries a coarse-cell column (any partitioner —
    * here KMeans.assign cells), each query scans only codes in ITS
    * cell, and the scored join is (sub, code, cell)-keyed against the
    * broadcast LUT — candidates drop from N to ~N/cells while the
    * per-candidate cost stays m integer lookups. Queries must carry
    * the same cell column (assign them with the same centroids). The
    * single-cell restriction inherits IVF's recall trade
    * (multi-probe = union the query's top-n cells before calling, the
    * assignTopN lever). */
  def pqAdcTopKByCell(codes: DataFrame, queries: DataFrame, idCol: String,
                      vecCol: String, cellCol: String, codebooks: DataFrame,
                      m: Int, dims: Int, k: Int): DataFrame =
    adcTopK(codes, queries, idCol, vecCol, Some(cellCol), codebooks,
      m, dims, k)

  /** TRUE MIPS-IVFADC scan — the residual composition with the
    * cross-cell correction the plain residual LUT lacks. Ranking by
    * ⟨q − c, x − c⟩ (what [[pqAdcTopKByCell]] over residual frames
    * computes) drops the per-candidate ⟨q, c⟩ term of
    * ⟨q, x⟩ = ⟨q, c⟩ + ⟨q, x − c⟩, which is constant within one cell
    * but VARIES across probed cells — measured on the fixture it
    * ranks residual codes BELOW raw-seed IVF-PQ (MicroBench
    * pq_ivfadc, r17). This scan scores the reconstructed inner
    * product exactly: LUT entries are ⟨q_sub, residual codeword⟩
    * from the RAW query subvectors, and each candidate adds its
    * cell's ⌊⟨q, c⟩·10⁶ + 0.5⌋ bias — both exact BIGINT terms, so
    * scores are comparable across probes and the oracle replays them
    * verbatim. `queries` carries one row per (query, probed cell)
    * with the RAW vector; `codes` carries the residual-encoded
    * corpus with its cell. */
  def pqIvfAdcTopK(codes: DataFrame, queries: DataFrame, idCol: String,
                   vecCol: String, cellCol: String, centroids: DataFrame,
                   codebooks: DataFrame, m: Int, dims: Int,
                   k: Int): DataFrame = {
    val subDim = dims / m
    val dot = "aggregate(zip_with(qv, centroid, (x, y) -> x * y), " +
      "cast(0 as double), (acc, v) -> acc + v)"
    val q = queries.select(col(idCol).as("query_id"), col(cellCol),
      col(vecCol).cast("array<double>").as("v"))
    // per-(query, probed cell) bias: ⌊⟨q, c⟩·10⁶ + 0.5⌋
    val qc = q.join(broadcast(centroids
        .select(col("cluster_id").as(cellCol), col("centroid"))), Seq(cellCol))
      .select(col("query_id"), col(cellCol),
        expr("cast(floor(aggregate(zip_with(v, centroid, " +
          "(x, y) -> x * y), cast(0 as double), (acc, w) -> acc + w) " +
          "* 1000000 + 0.5) as bigint)").as("qc_u"))
    val qsubs = q
      .select(col("query_id"), col(cellCol),
        explode(expr(s"transform(sequence(0, ${m - 1}), " +
          s"s -> struct(s AS sub, slice(v, s * $subDim + 1, $subDim) AS qv))"))
          .as("e"))
      .select(col("query_id"), col(cellCol), col("e.sub").as("sub"),
        col("e.qv").as("qv"))
    val lut = qsubs.join(broadcast(codebooks), Seq("sub"))
      .select(col("query_id"), col(cellCol), col("sub"), col("code"),
        expr(s"cast(floor($dot * 1000000 + 0.5) as bigint)").as("lut_u"))
    val scored = codes.join(broadcast(lut), Seq("sub", "code", cellCol))
      .where(col("id") =!= col("query_id"))
      .groupBy(col("query_id"), col("id"), col(cellCol))
      .agg(sum(col("lut_u")).as("res_u"))
      .join(broadcast(qc), Seq("query_id", cellCol))
      .select(col("query_id"), col("id"),
        (col("res_u") + col("qc_u")).as("score_u"))
    val best = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("score_u").desc, col("id"))
    scored.withColumn("rank", row_number().over(best).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("id").as("nbr_id"),
        col("score_u"), col("rank"))
  }

  private def adcTopK(codes: DataFrame, queries: DataFrame, idCol: String,
                      vecCol: String, cellCol: Option[String],
                      codebooks: DataFrame, m: Int, dims: Int,
                      k: Int): DataFrame = {
    val subDim = dims / m
    val dot = "aggregate(zip_with(qv, centroid, (x, y) -> x * y), " +
      "cast(0 as double), (acc, v) -> acc + v)"
    val cellCols = cellCol.toSeq.map(col)
    val qsubs = queries.select(col(idCol).as("query_id") +: cellCols :+
        col(vecCol).cast("array<double>").as("v"): _*)
      .select(col("query_id") +: cellCols :+
        explode(expr(s"transform(sequence(0, ${m - 1}), " +
          s"s -> struct(s AS sub, slice(v, s * $subDim + 1, $subDim) AS qv))"))
          .as("e"): _*)
      .select(col("query_id") +: cellCols :+ col("e.sub").as("sub") :+
        col("e.qv").as("qv"): _*)
    val lut = qsubs.join(broadcast(codebooks), Seq("sub"))
      .select(col("query_id") +: cellCols :+ col("sub") :+ col("code") :+
        expr(s"cast(floor($dot * 1000000 + 0.5) as bigint)").as("lut_u"): _*)
    val joinKeys = Seq("sub", "code") ++ cellCol
    val scored = codes.join(broadcast(lut), joinKeys)
      .where(col("id") =!= col("query_id"))
      .groupBy(col("query_id"), col("id"))
      .agg(sum(col("lut_u")).as("score_u"))
    val best = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("score_u").desc, col("id"))
    scored.withColumn("rank", row_number().over(best).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("id").as("nbr_id"),
        col("score_u"), col("rank"))
  }

  /** SQ8 ASYMMETRIC scan — the [[encode]] quantizer's serving shape,
    * completing the compression/serving triad (BQ 32× / PQ 16× /
    * SQ8 8×): corpus vectors are their per-dim integer codes (1 byte
    * per dim, packed here as a bigint array projection — no shuffle,
    * no explode), and each query becomes a per-dim integer WEIGHT
    * vector w_d = ⌊q_d·step_d·10⁶ + 0.5⌋, so the candidate score
    * Σ w_d·code_d is an exact integer proxy of
    * ⟨q, dequant(x)⟩ − Σ q_d·lo_d (the dropped term is constant per
    * query — rank-equivalent within a query, the asymmetric-distance
    * argument of the PQ LUT at the scalar grain). The top
    * `candidates` per query (score desc, ties to the lowest id) then
    * pay the exact full-width cosine. Returns
    * (query_id, nbr_id, sq_u, score, rank). */
  def sq8AdcTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                 vecCol: String, dims: Int, levels: Int,
                 candidates: Int, k: Int): DataFrame = {
    require(levels >= 2 && candidates >= k,
      s"need levels >= 2 and candidates >= k: $levels, $candidates, $k")
    graft.expressions.GraftFunctions.register(corpus.sparkSession)
    val c = graft.operators.Spread.ensure(
      corpus.select(col(idCol).as("nbr_id"),
        col(vecCol).cast("array<double>").as("nv")))
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"))
    // per-dim [lo, hi] as two broadcast 1-row arrays (dim-sorted)
    val arrs = dimRanges(c, "nv").groupBy().agg(
      expr("transform(array_sort(collect_list(struct(dim, lo))), " +
        "x -> x.lo)").as("los"),
      expr("transform(array_sort(collect_list(struct(dim, hi))), " +
        "x -> x.hi)").as("his"))
    val lv = levels - 1
    val codes = c.crossJoin(broadcast(arrs))
      .select(col("nbr_id"), col("nv"),
        expr(s"transform(sequence(0, ${dims - 1}), " +
          "d -> IF(his[d] = los[d], 0L, " +
          s"cast(floor((nv[d] - los[d]) / " +
          s"(his[d] - los[d]) * $lv + 0.5) as bigint)))")
          .as("codes"))
    val qw = q.crossJoin(broadcast(arrs))
      .select(col("query_id"), col("qv"),
        expr(s"transform(sequence(0, ${dims - 1}), " +
          "d -> cast(floor(qv[d] * " +
          "(CASE WHEN his[d] = los[d] THEN cast(0.0 as double) " +
          s"ELSE (his[d] - los[d]) / $lv END) " +
          "* 1000000 + 0.5) as bigint))").as("w"))
    val scored = codes.select(col("nbr_id"), col("codes"))
      .join(broadcast(qw.select(col("query_id"), col("w"))),
        col("query_id") =!= col("nbr_id"))
      .select(col("query_id"), col("nbr_id"),
        expr("aggregate(zip_with(codes, w, (c, x) -> c * x), 0L, " +
          "(a, b) -> a + b)").as("sq_u"))
    val wc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("sq_u").desc, col("nbr_id"))
    val shortlist = scored.withColumn("crank", row_number().over(wc))
      .where(col("crank") <= candidates)
      .select(col("query_id"), col("nbr_id"), col("sq_u"))
    val wr = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("nbr_id"))
    shortlist.join(c, Seq("nbr_id")).join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("nbr_id"), col("sq_u"),
        round(call_function(graft.expressions.GraftFunctions.Cosine,
          col("qv"), col("nv")), 6).as("score"))
      .withColumn("rank", row_number().over(wr).cast("long"))
      .where(col("rank") <= k)
  }

  /** The SQ8 index's TRAINED-range artifact: one row of dim-sorted
    * (los, his) arrays over the given corpus — what a 100 TB
    * pipeline persists next to the code table so appended batches
    * encode against the index's FROZEN grid instead of re-scanning
    * the corpus for min/max (re-deriving ranges would silently
    * re-grid every stored code). */
  def sq8RangeArrays(corpus: DataFrame, idCol: String,
                     vecCol: String): DataFrame = {
    val c = corpus.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))
    dimRanges(c, "v").groupBy().agg(
      expr("transform(array_sort(collect_list(struct(dim, lo))), " +
        "x -> x.lo)").as("los"),
      expr("transform(array_sort(collect_list(struct(dim, hi))), " +
        "x -> x.hi)").as("his"))
  }

  /** Encode against a GIVEN ranges frame ([[sq8RangeArrays]]) — the
    * index-append path: one batch pass × the broadcast 1-row grid,
    * values outside the trained range CLAMP to the grid's ends
    * (the standard scalar-quantizer saturation; for in-range values
    * the expression is [[sq8AdcTopK]]'s encode unchanged). Returns
    * (id, codes). */
  def sq8EncodeAgainst(batch: DataFrame, idCol: String, vecCol: String,
                       arrs: DataFrame, dims: Int,
                       levels: Int): DataFrame = {
    require(levels >= 2, s"levels must be >= 2: $levels")
    val lv = levels - 1
    batch.select(col(idCol).as("id"),
        col(vecCol).cast("array<double>").as("v"))
      .crossJoin(broadcast(arrs))
      .select(col("id"),
        expr(s"transform(sequence(0, ${dims - 1}), " +
          "d -> IF(his[d] = los[d], 0L, " +
          s"greatest(0L, least(cast($lv as bigint), " +
          s"cast(floor((v[d] - los[d]) / " +
          s"(his[d] - los[d]) * $lv + 0.5) as bigint)))))")
          .as("codes"))
  }

  /** The [[sq8AdcTopK]] funnel over a PREBUILT index — saved codes
    * plus the trained ranges, so serving after an append touches the
    * batch pass only, never the corpus: weights derive from the
    * index's frozen grid, the scan reads the (id, codes) table, and
    * the exact rerank joins the shortlist back to `vectors`. Same
    * cuts, same returns (query_id, nbr_id, sq_u, score, rank). */
  def sq8AdcTopKFromIndex(codes: DataFrame, arrs: DataFrame,
                          vectors: DataFrame, queries: DataFrame,
                          idCol: String, vecCol: String, dims: Int,
                          levels: Int, candidates: Int,
                          k: Int): DataFrame = {
    require(levels >= 2 && candidates >= k,
      s"need levels >= 2 and candidates >= k: $levels, $candidates, $k")
    graft.expressions.GraftFunctions.register(codes.sparkSession)
    val lv = levels - 1
    val c = graft.operators.Spread.ensure(
      vectors.select(col(idCol).as("nbr_id"),
        col(vecCol).cast("array<double>").as("nv")))
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"))
    val qw = q.crossJoin(broadcast(arrs))
      .select(col("query_id"),
        expr(s"transform(sequence(0, ${dims - 1}), " +
          "d -> cast(floor(qv[d] * " +
          "(CASE WHEN his[d] = los[d] THEN cast(0.0 as double) " +
          s"ELSE (his[d] - los[d]) / $lv END) " +
          "* 1000000 + 0.5) as bigint))").as("w"))
    val scored = codes.select(col("id").as("nbr_id"), col("codes"))
      .join(broadcast(qw), col("query_id") =!= col("nbr_id"))
      .select(col("query_id"), col("nbr_id"),
        expr("aggregate(zip_with(codes, w, (c, x) -> c * x), 0L, " +
          "(a, b) -> a + b)").as("sq_u"))
    val wc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("sq_u").desc, col("nbr_id"))
    val shortlist = scored.withColumn("crank", row_number().over(wc))
      .where(col("crank") <= candidates)
      .select(col("query_id"), col("nbr_id"), col("sq_u"))
    val wr = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("nbr_id"))
    shortlist.join(c, Seq("nbr_id")).join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("nbr_id"), col("sq_u"),
        round(call_function(graft.expressions.GraftFunctions.Cosine,
          col("qv"), col("nv")), 6).as("score"))
      .withColumn("rank", row_number().over(wr).cast("long"))
      .where(col("rank") <= k)
  }

  /** Cell-restricted SQ8 scan — the IVF×SQ composition (the FAISS
    * IVF-SQ serving shape, and [[pqAdcTopKByCell]]'s scalar twin):
    * the corpus quantizes against GLOBAL per-dim ranges (the trained
    * quantizer — appended cells reuse it), carries its coarse cell,
    * and each query scans ONLY the cells it probes. The scored join
    * is an equi-join on the cell key against the broadcast
    * (query, probed cell, weight-vector) frame — candidates drop
    * from N to ~nprobe·N/cells while the per-candidate cost stays
    * one integer zip_with — which is what turns the r17 flat Q×N
    * funnel into the 100 TB serving shape: at 1000 executors the
    * code table partitions by cell and a query touches nprobe
    * partitions, never the corpus. Probe rows for one query are
    * distinct cells and a code row lives in exactly one cell, so
    * the per-query candidate union is disjoint — no dedup stage.
    * Shortlist cut and exact full-width rerank are the
    * [[sq8AdcTopK]] contract verbatim.
    *
    * `corpus` carries (idCol, vecCol, cellCol); `queries` carries
    * one row per (query, probed cell) with the RAW vector. Returns
    * (query_id, nbr_id, sq_u, score, rank). */
  def sq8AdcTopKByCell(corpus: DataFrame, queries: DataFrame,
                       idCol: String, vecCol: String, cellCol: String,
                       dims: Int, levels: Int, candidates: Int,
                       k: Int): DataFrame = {
    require(levels >= 2 && candidates >= k,
      s"need levels >= 2 and candidates >= k: $levels, $candidates, $k")
    graft.expressions.GraftFunctions.register(corpus.sparkSession)
    val c = graft.operators.Spread.ensure(
      corpus.select(col(idCol).as("nbr_id"), col(cellCol).as("cell"),
        col(vecCol).cast("array<double>").as("nv")))
    val q = queries.select(col(idCol).as("query_id"),
      col(cellCol).as("cell"),
      col(vecCol).cast("array<double>").as("qv"))
    val arrs = dimRanges(c, "nv").groupBy().agg(
      expr("transform(array_sort(collect_list(struct(dim, lo))), " +
        "x -> x.lo)").as("los"),
      expr("transform(array_sort(collect_list(struct(dim, hi))), " +
        "x -> x.hi)").as("his"))
    val lv = levels - 1
    val codes = c.crossJoin(broadcast(arrs))
      .select(col("nbr_id"), col("cell"),
        expr(s"transform(sequence(0, ${dims - 1}), " +
          "d -> IF(his[d] = los[d], 0L, " +
          s"cast(floor((nv[d] - los[d]) / " +
          s"(his[d] - los[d]) * $lv + 0.5) as bigint)))")
          .as("codes"))
    val qw = q.crossJoin(broadcast(arrs))
      .select(col("query_id"), col("cell"),
        expr(s"transform(sequence(0, ${dims - 1}), " +
          "d -> cast(floor(qv[d] * " +
          "(CASE WHEN his[d] = los[d] THEN cast(0.0 as double) " +
          s"ELSE (his[d] - los[d]) / $lv END) " +
          "* 1000000 + 0.5) as bigint))").as("w"))
    val scored = codes.join(broadcast(qw), Seq("cell"))
      .where(col("query_id") =!= col("nbr_id"))
      .select(col("query_id"), col("nbr_id"),
        expr("aggregate(zip_with(codes, w, (c, x) -> c * x), 0L, " +
          "(a, b) -> a + b)").as("sq_u"))
    val wc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("sq_u").desc, col("nbr_id"))
    val shortlist = scored.withColumn("crank", row_number().over(wc))
      .where(col("crank") <= candidates)
      .select(col("query_id"), col("nbr_id"), col("sq_u"))
    val wr = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("nbr_id"))
    shortlist
      .join(c.select(col("nbr_id"), col("nv")), Seq("nbr_id"))
      .join(broadcast(q.select(col("query_id"), col("qv"))
        .dropDuplicates("query_id")), Seq("query_id"))
      .select(col("query_id"), col("nbr_id"), col("sq_u"),
        round(call_function(graft.expressions.GraftFunctions.Cosine,
          col("qv"), col("nv")), 6).as("score"))
      .withColumn("rank", row_number().over(wr).cast("long"))
      .where(col("rank") <= k)
  }

  /** BINARY quantization (sign bits packed into 32-bit words) — the
    * most aggressive point on the compression curve: 1 bit per
    * dimension, 64 dims → 8 bytes (32× over float32, 8× over PQ's
    * m = 4 bytes... per 4× fewer distinctions). For unit-norm
    * embeddings, Hamming distance between sign patterns is a
    * monotone proxy for angular distance (the SimHash argument —
    * P[sign differs] = θ/π per dim), so the serving shape is
    * hamming-shortlist-then-exact-rerank: the scan touches ONLY the
    * two packed words per candidate (xor + bit_count, no floats),
    * and `candidates` rows per query pay the full-width cosine.
    * Packing is a pure projection — no shuffle, no explode: word w
    * is an exact integer sum of distinct powers 2^i over dims
    * [32w, 32w+32), each < 2^32, computed with the zip_with/aggregate
    * form the ADC LUT already uses.
    *
    * Returns (id, b0, b1); dims ≤ 64 (one or two words — the gate
    * corpus is 64-dim; wider vectors would generalize the word list).
    */
  def bqEncode(corpus: DataFrame, idCol: String, vecCol: String,
               dims: Int): DataFrame = {
    require(dims >= 1 && dims <= 64, s"dims must be in [1, 64]: $dims")
    corpus.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))
      .select(col("id") +: (0 until 2).map { w =>
        val lo = 32 * w
        val len = math.max(0, math.min(32, dims - lo))
        (if (len == 0) lit(0L)
         else expr(s"aggregate(zip_with(slice(v, ${lo + 1}, $len), " +
           s"sequence(0, ${len - 1}), " +
           "(x, i) -> IF(x > 0, shiftleft(1L, cast(i AS int)), 0L)), " +
           "0L, (a, b) -> a + b)")).as(s"b$w")
      }: _*)
  }

  /** Hamming-shortlist + exact-rerank top-k over [[bqEncode]] codes:
    * every (query, candidate) pair costs two xors + two bit_counts
    * on the packed words; the `candidates` best per query (hamming
    * ASC, ties to the lowest id — a deterministic cut) join back to
    * the float vectors for the exact round-6 cosine rerank. Returns
    * (query_id, nbr_id, hamming, score, rank). */
  def bqRerankTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                   vecCol: String, dims: Int, candidates: Int,
                   k: Int): DataFrame = {
    val c = graft.operators.Spread.ensure(
      corpus.select(col(idCol).as("nbr_id"),
        col(vecCol).cast("array<double>").as("nv")))
    bqRerankTopKFromCodes(bqEncode(c, "nbr_id", "nv", dims),
      corpus, queries, idCol, vecCol, dims, candidates, k)
  }

  /** The [[bqRerankTopK]] funnel over a PREBUILT packed-word table
    * ([[bqEncode]]'s (id, b0, b1)) — the index-append path: BQ has
    * no trained state (sign bits only), so maintenance is encode the
    * batch + union the words, and serving reads the saved table;
    * the exact rerank joins the shortlist back to `vectors`. */
  def bqRerankTopKFromCodes(codes: DataFrame, vectors: DataFrame,
                            queries: DataFrame, idCol: String,
                            vecCol: String, dims: Int, candidates: Int,
                            k: Int): DataFrame = {
    require(candidates >= k, s"candidates ($candidates) must be >= k ($k)")
    graft.expressions.GraftFunctions.register(vectors.sparkSession)
    val c = graft.operators.Spread.ensure(
      vectors.select(col(idCol).as("nbr_id"),
        col(vecCol).cast("array<double>").as("nv")))
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"))
    val ccodes = codes.withColumnRenamed("id", "nbr_id")
    val qcodes = bqEncode(q, "query_id", "qv", dims)
      .select(col("id").as("query_id"), col("b0").as("qb0"),
        col("b1").as("qb1"))
    val ham = ccodes.join(broadcast(qcodes),
        col("query_id") =!= col("nbr_id"))
      .select(col("query_id"), col("nbr_id"),
        expr("bit_count(b0 ^ qb0) + bit_count(b1 ^ qb1)")
          .cast("long").as("hamming"))
    val wc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("hamming").asc, col("nbr_id"))
    val shortlist = ham.withColumn("crank", row_number().over(wc))
      .where(col("crank") <= candidates)
      .select(col("query_id"), col("nbr_id"), col("hamming"))
    val wr = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("nbr_id"))
    shortlist.join(c, Seq("nbr_id")).join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("nbr_id"), col("hamming"),
        round(call_function(graft.expressions.GraftFunctions.Cosine,
          col("qv"), col("nv")), 6).as("score"))
      .withColumn("rank", row_number().over(wr).cast("long"))
      .where(col("rank") <= k)
  }

  /** Cell-restricted BQ funnel — [[bqRerankTopK]] composed with IVF
    * cells (completing the cell-restricted serving family: PQ
    * [[pqAdcTopKByCell]], SQ8 [[sq8AdcTopKByCell]], MRL
    * `Similarity.truncatedRerankKnnByCell`, and now the 32× packed
    * words): the word table carries its coarse cell and the hamming
    * scan is an EQUI-join on the cell key against the broadcast
    * (query, probed cell, query words) frame — 8 bytes per candidate
    * touched, and only ~nprobe/cells of the candidates at all.
    * Cuts and the exact rerank are the flat funnel's contract.
    * `corpus` carries (idCol, vecCol, cellCol); `queries` one row
    * per (query, probed cell). */
  def bqRerankTopKByCell(corpus: DataFrame, queries: DataFrame,
                         idCol: String, vecCol: String, cellCol: String,
                         dims: Int, candidates: Int, k: Int): DataFrame = {
    require(candidates >= k, s"candidates ($candidates) must be >= k ($k)")
    graft.expressions.GraftFunctions.register(corpus.sparkSession)
    val c = graft.operators.Spread.ensure(
      corpus.select(col(idCol).as("nbr_id"), col(cellCol).as("cell"),
        col(vecCol).cast("array<double>").as("nv")))
    val q = queries.select(col(idCol).as("query_id"),
      col(cellCol).as("cell"),
      col(vecCol).cast("array<double>").as("qv"))
    val ccodes = bqEncode(c, "nbr_id", "nv", dims)
      .withColumnRenamed("id", "nbr_id")
      .join(c.select(col("nbr_id"), col("cell")), Seq("nbr_id"))
    val qcodes = bqEncode(q.dropDuplicates("query_id"),
        "query_id", "qv", dims)
      .select(col("id").as("query_id"), col("b0").as("qb0"),
        col("b1").as("qb1"))
      .join(q.select(col("query_id"), col("cell")), Seq("query_id"))
    val ham = ccodes.join(broadcast(qcodes), Seq("cell"))
      .where(col("query_id") =!= col("nbr_id"))
      .select(col("query_id"), col("nbr_id"),
        expr("bit_count(b0 ^ qb0) + bit_count(b1 ^ qb1)")
          .cast("long").as("hamming"))
    val wc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("hamming").asc, col("nbr_id"))
    val shortlist = ham.withColumn("crank", row_number().over(wc))
      .where(col("crank") <= candidates)
      .select(col("query_id"), col("nbr_id"), col("hamming"))
    val wr = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("nbr_id"))
    shortlist
      .join(c.select(col("nbr_id"), col("nv")), Seq("nbr_id"))
      .join(broadcast(q.select(col("query_id"), col("qv"))
        .dropDuplicates("query_id")), Seq("query_id"))
      .select(col("query_id"), col("nbr_id"), col("hamming"),
        round(call_function(graft.expressions.GraftFunctions.Cosine,
          col("qv"), col("nv")), 6).as("score"))
      .withColumn("rank", row_number().over(wr).cast("long"))
      .where(col("rank") <= k)
  }

  /** Coarse-cell RESIDUALS — the IVFADC composition's encode input
    * (Jégou et al. §IV: quantize x − c(x), not x, so the PQ codebook
    * spends its 2^bits on the WITHIN-cell distribution instead of
    * re-describing the coarse partition; at a fixed code budget the
    * residual energy is what's left after the coarse quantizer, so
    * reconstruction error drops without touching the scan shape).
    * One corpus pass × broadcast(coarse centroids): (id, cell, rv).
    *
    * Degeneracy contract: a vector that IS a coarse centroid has an
    * exactly-zero residual. Zero subvectors score every codeword at
    * the SAME constant (house cosine defines 0 on a zero norm;
    * DuckDB's defines −1 — constant either way), so the argmax
    * tie-breaks to code 0 identically on both engines — but a zero
    * CODEWORD meeting a nonzero subvector scores 0 vs −1 and
    * diverges, which is why [[pqCodebooksTrained]]/[[pqCodebooks]]
    * seeds for residual corpora must EXCLUDE the coarse-seed ids
    * (their residuals are the zero vectors). */
  def residuals(corpus: DataFrame, idCol: String, vecCol: String,
                cells: DataFrame, centroids: DataFrame): DataFrame =
    corpus.select(col(idCol).as("id"),
        col(vecCol).cast("array<double>").as("v"))
      .join(cells, Seq("id"))
      .join(broadcast(centroids
        .select(col("cluster_id").as("cell"), col("centroid"))), Seq("cell"))
      .select(col("id"), col("cell"),
        zip_with(col("v"), col("centroid"), (x, c) => x - c).as("rv"))

  /** Per-vector PQ quantization contract — [[auditStats]]' PQ twin,
    * the quality bound a pipeline persists next to the codes: the
    * assignment score of each subvector against its chosen codeword
    * IS the reconstruction similarity (argmax cosine, round 6), so
    * the audit is the encode plan with the score retained. Returns
    * (id, n_subs, code_sum, min_sim): sub count, the position-
    * weighted integer code checksum (permuted codes don't collide),
    * and the WORST subvector-to-codeword cosine — a selection over
    * round-6 values, order-free and oracle-replayable (no float
    * sums). */
  def pqAuditStats(corpus: DataFrame, idCol: String, vecCol: String,
                   codebooks: DataFrame, m: Int, dims: Int): DataFrame = {
    val subDim = dims / m
    graft.expressions.GraftFunctions.register(corpus.sparkSession)
    val subs = graft.operators.Spread.ensure(
      corpus.select(col(idCol).as("id"),
        col(vecCol).cast("array<double>").as("v")))
      .select(col("id"), explode(expr(s"transform(sequence(0, ${m - 1}), " +
        s"s -> struct(s AS sub, slice(v, s * $subDim + 1, $subDim) AS sv))"))
        .as("e"))
      .select(col("id"), col("e.sub").as("sub"), col("e.sv").as("sv"))
    val scored = subs.join(broadcast(codebooks), Seq("sub"))
      .select(col("id"), col("sub"), col("code"),
        round(call_function(graft.expressions.GraftFunctions.Cosine,
          col("sv"), col("centroid")), 6).as("score"))
    val best = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id"), col("sub"))
      .orderBy(col("score").desc, col("code"))
    scored.withColumn("rn", row_number().over(best))
      .where(col("rn") === 1)
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_subs"),
        sum(col("code") * (col("sub") + 1)).as("code_sum"),
        min(col("score")).as("min_sim"))
  }

  /** Per-vector quantization contract: dims, an integer code checksum
    * (position-weighted so permuted codes don't collide), and the
    * worst absolute reconstruction error across dimensions. */
  def auditStats(corpus: DataFrame, idCol: String, vecCol: String,
                 levels: Int = 256): DataFrame = {
    val e = encode(corpus, idCol, vecCol, levels)
    val recon = when(col("hi") === col("lo"), col("lo"))
      .otherwise(col("lo") + col("code") * (col("hi") - col("lo"))
        / (levels - 1))
    e.groupBy(col("id").as(idCol))
      .agg(count(lit(1)).as("dims"),
        sum(col("code") * (col("dim") + 1)).as("code_sum"),
        round(max(abs(col("val") - recon)), 6).as("max_err"))
  }
}
