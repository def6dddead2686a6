package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Cardinality sketches for profiling 100-TB inputs.
  *
  * KMV (k-minimum-values): keep the k smallest values of a uniform
  * hash; with r_k = k-th smallest hash normalized to (0,1], the
  * distinct count estimate is (k-1)/r_k (Bar-Yossef et al. 2002;
  * standard error ≈ 1/√(k−2)). Spark's built-in
  * `approx_count_distinct` (HLL++) is the go-to when reproducibility
  * doesn't matter; KMV over the md5-derived `TextFunctions.hash64`
  * is chosen here because the estimate is DETERMINISTIC and
  * engine-independent — the DuckDB oracle computes the identical
  * number, so even the approximation is correctness-gated.
  *
  * Distributed shape: project to (key, hash) → distinct (one shuffle,
  * map-side partial) → per-key ascending row_number (shuffle by key)
  * → first-k aggregate. The k-minima multiset is mergeable (union
  * then re-take k minima), so partial sketches from separate scans
  * can be combined without rescanning.
  */
object Sketches {

  /** Per-key distinct-count estimate for `valueCol`. Keys with fewer
    * than k distinct values get the EXACT count (the sketch holds all
    * their hashes). Returns (key, est_distinct). */
  def kmvDistinctByKey(df: DataFrame, keyCol: String, valueCol: String,
                       k: Int = 64): DataFrame = {
    require(k >= 2, "k must be >= 2")
    val twoPow60 = 1152921504606846976.0 // hash64 range is [0, 2^60)
    val hashed = df.select(col(keyCol).as("key"),
      TextFunctions.hash64(col(valueCol).cast("string")).as("h"))
      .distinct()
    val byHash = Window.partitionBy(col("key")).orderBy(col("h"))
    hashed.withColumn("rn", row_number().over(byHash))
      .where(col("rn") <= k) // sketch rows only; the rest never aggregate
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n"),
        max(when(col("rn") === k, col("h"))).as("hk"))
      .select(col("key"),
        round(when(col("n") < k, col("n").cast("double"))
          .otherwise(lit(k - 1) / (col("hk") / lit(twoPow60))), 4)
          .as("est_distinct"))
  }

  /** Distinct-count estimate from a [[KmvMinima]] ascending minima
    * array: exact below k (the sketch holds every hash), else
    * (k-1)/r_k with r_k the k-th minimum normalized to hash64's
    * [0, 2^60) range. Same formula as [[kmvDistinctByKey]], so both
    * phrasings (window batch, bounded-state aggregate) hash-match the
    * same oracle. */
  def estimateFromMinima(minima: Column, k: Int): Column = {
    val twoPow60 = 1152921504606846976.0 // 2^60
    round(when(size(minima) < k, size(minima).cast("double"))
      .otherwise(lit(k - 1) /
        (element_at(minima, k).cast("double") / lit(twoPow60))), 4)
  }

  /** Cross-dataset set-operation estimates from two KMV sketches —
    * distinct |A|, |B|, |A∪B|, Jaccard, and |A∩B| WITHOUT joining the
    * underlying data: at 100 TB, "how much do these two id spaces
    * overlap" costs two scans that each shuffle one k-array, not an
    * id-level join. The union sketch is the k smallest of the merged
    * minima (KMV's closure under union); Jaccard is the classic
    * estimator |M_k(A∪B) ∩ M(A) ∩ M(B)| / |M_k(A∪B)|; intersection is
    * Jaccard × union, composed from the already-rounded terms so any
    * engine reproduces the same number. One output row. */
  def kmvSetOps(a: DataFrame, aCol: String, b: DataFrame, bCol: String,
                k: Int = 64): DataFrame = {
    require(k >= 2, "k must be >= 2")
    val kmv = KmvMinima(k)
    def minima(df: DataFrame, c: String, out: String) =
      df.agg(kmv(TextFunctions.hash64(col(c).cast("string"))).as(out))
    val ma = minima(a, aCol, "ma")
    val mb = minima(b, bCol, "mb")
    val merged = slice(array_sort(array_distinct(
      concat(col("ma"), col("mb")))), 1, k)
    ma.crossJoin(mb) // 1 row × 1 row
      .withColumn("mu", merged)
      .withColumn("inter_k",
        size(array_intersect(array_intersect(col("mu"), col("ma")),
          col("mb"))))
      .select(
        estimateFromMinima(col("ma"), k).as("est_a"),
        estimateFromMinima(col("mb"), k).as("est_b"),
        estimateFromMinima(col("mu"), k).as("est_union"),
        round(col("inter_k").cast("double") / size(col("mu")), 4)
          .as("est_jaccard"))
      .withColumn("est_intersection",
        round(col("est_jaccard") * col("est_union"), 4))
  }

  /** Mergeable fixed-bin quantile estimates: clamp values into
    * `bins` integer-width buckets, count per (key, bin) — a
    * fixed-size, cell-wise-addable sketch like [[countMinEstimates]]
    * — then report, for each requested quantile, the left edge of the
    * first bin whose cumulative count reaches ⌈q·total⌉. Error is
    * bounded by `binWidth`; state is ≤ `bins` cells per key no matter
    * how many rows feed it, and two scans' sketches merge by adding
    * bin counts (the bounded-memory percentile for 100-TB streams —
    * exact `percentile()` needs the full value multiset).
    *
    * Everything is INTEGER arithmetic — bins, cumulative counts, and
    * the ⌈q·total⌉ threshold computed as (q_pm·total + 999) div 1000
    * from per-mille quantiles — so estimates hash-match any engine.
    * Returns (key, q_pm, est) with est = lo + bin·binWidth. */
  def binQuantileEstimates(df: DataFrame, keyCol: String, valCol: String,
                           lo: Long, binWidth: Long, bins: Int,
                           quantilesPermille: Seq[Int]): DataFrame = {
    require(binWidth > 0 && bins > 0, "binWidth and bins must be positive")
    require(quantilesPermille.forall(q => q > 0 && q <= 1000),
      "quantiles are per-mille in (0, 1000]")
    val cells = df.select(col(keyCol).as("key"),
        binColumn(col(valCol), lo, binWidth, bins).as("bin"))
      .groupBy(col("key"), col("bin")).agg(count(lit(1)).as("n"))
    quantilesFromBinCounts(cells, lo, binWidth, quantilesPermille)
  }

  /** The clamped integer bin id for [[binQuantileEstimates]] — shared
    * with streaming aggregations that maintain the (key, bin) cells
    * themselves (bounded per-window state). */
  def binColumn(value: Column, lo: Long, binWidth: Long,
                bins: Int): Column =
    least(greatest(
      floor((value - lit(lo)) / lit(binWidth)).cast("long"), lit(0L)),
      lit(bins - 1L))

  /** Quantile read over pre-aggregated (key, bin, n) cells — the merge
    * path: cells from many scans/streams add cell-wise, then one read
    * here. Integer thresholds throughout (see
    * [[binQuantileEstimates]]). */
  def quantilesFromBinCounts(cells: DataFrame, lo: Long, binWidth: Long,
                             quantilesPermille: Seq[Int]): DataFrame = {
    // an empty list would build invalid SQL below (`VALUES  AS t`)
    // and surface as an opaque parse error
    require(quantilesPermille.nonEmpty, "quantilesPermille must be non-empty")
    val cum = Window.partitionBy(col("key")).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy(col("key"))
    val withCum = cells
      .withColumn("cum", sum(col("n")).over(cum))
      .withColumn("tot", sum(col("n")).over(tot))
    val qs = quantilesPermille.map(q => s"($q)").mkString(", ")
    withCum
      .join(cells.sparkSession.sql(s"SELECT * FROM VALUES $qs AS t(q_pm)")
        .hint("broadcast"), expr("cum >= (q_pm * tot + 999) div 1000"))
      .groupBy(col("key"), col("q_pm"))
      .agg(min(col("bin")).as("qbin"))
      .select(col("key"), col("q_pm"),
        (lit(lo) + col("qbin") * lit(binWidth)).as("est"))
  }

  /** Count-min sketch heavy-hitter estimates: `depth` independent
    * md5-derived hash rows × `width` buckets; est(x) = min over rows
    * of its bucket total. Estimates only ever OVERCOUNT (collisions
    * add), so ranking by estimate never drops a true heavy hitter
    * whose frequency exceeds the collision noise.
    *
    * Distributed shape: the sketch is a (depth×width)-cell table
    * built by ONE groupBy over (row, bucket) — fixed-size state, fully
    * mergeable across scans/streams by cell-wise addition, the
    * classic bounded-memory answer to "top terms over 100 TB". The
    * candidate estimates then come from an equi-join of candidates ×
    * cells on the bucket key. Hashing is `TextFunctions.hash64` with
    * per-row salts, so any engine reproduces the exact same cells. */
  def countMinEstimates(items: DataFrame, itemCol: String,
                        candidates: DataFrame, candCol: String,
                        depth: Int = 4, width: Int = 1024): DataFrame = {
    // (row d, bucket) totals: one explode to depth rows per item —
    // output cardinality depth × width regardless of input size
    val rows = (0 until depth).map(lit(_))
    val cells = items.select(col(itemCol).as("x"))
      .select(explode(array(rows: _*)).as("d"), col("x"))
      .select(col("d"),
        pmod(TextFunctions.hash64(concat_ws("#", col("d"), col("x"))),
          lit(width)).as("b"))
      .groupBy(col("d"), col("b")).agg(count(lit(1)).as("c"))
    val cand = candidates.select(col(candCol).as("item")).distinct()
      .select(col("item"), explode(array(rows: _*)).as("d"))
      .select(col("item"), col("d"),
        pmod(TextFunctions.hash64(concat_ws("#", col("d"), col("item"))),
          lit(width)).as("b"))
    cand.join(cells, Seq("d", "b"))
      .groupBy(col("item"))
      .agg(min(col("c")).as("est_count"))
  }

  /** Join-cardinality estimate WITHOUT executing the join:
    * |A ⋈_key B| = Σ_k n_A(k)·n_B(k), estimated as the MIN over CMS
    * depth rows of the bucket-count inner product Σ_b cA[d,b]·cB[d,b]
    * (the classic CM-sketch inner-product bound: collisions only ADD
    * mass, so every row overestimates and the min is tightest, exact
    * when some row has no cross-key collisions).
    *
    * The 100-TB use: decide shuffle-vs-broadcast-vs-salt for a join
    * from two bounded-state scans BEFORE paying the join's shuffle —
    * each side's sketch is one map-combined groupBy, and the inner
    * product runs over the nonzero cells. SIZE width ≫ the expected
    * distinct-key count: the expected overestimate is the additive
    * collision term ≈ |L|·|R|/width, and because only NONZERO cells
    * materialize, state is depth × min(width, distinct keys) rows —
    * a huge width costs nothing extra on sparse key spaces. Hashing
    * is the same salted `TextFunctions.hash64` as
    * [[countMinEstimates]], so the estimate itself is deterministic
    * and oracle-gated. Returns one row: (est_rows). */
  def cmsJoinSizeEstimate(left: DataFrame, leftCol: String,
                          right: DataFrame, rightCol: String,
                          depth: Int = 4, width: Int = 1024): DataFrame = {
    require(depth > 0 && width > 0, "depth and width must be positive")
    // ONE md5 per row; the per-depth buckets are cheap affine rehashes
    // of the base hash mod the MinHash prime (same independent-row
    // trick as the MinHash permutations — hashing the row-salted
    // string per depth costs depth× the md5 work for no extra
    // independence). a·h stays < 2^60, so the arithmetic is exact in
    // BIGINT on any engine.
    val p = TextFunctions.MinHashP
    def sketch(df: DataFrame, c: String, out: String) =
      df.select((TextFunctions.hash64(col(c).cast("string")) % p).as("h"))
        .select(explode(array((0 until depth).map { d =>
          val (a, b) = TextFunctions.minHashCoeff(d)
          struct(lit(d).as("d"),
            pmod(pmod(col("h") * a + b, lit(p)), lit(width)).as("b"))
        }: _*)).as("db"))
        .select(col("db.d").as("d"), col("db.b").as("b"))
        .groupBy(col("d"), col("b")).agg(count(lit(1)).as(out))
    // a depth row with NO shared bucket has inner product 0 — it must
    // zero the min, not vanish from it (disjoint key sets → est 0)
    sketch(left, leftCol, "cl")
      .join(sketch(right, rightCol, "cr"), Seq("d", "b"))
      .groupBy(col("d")).agg(sum(col("cl") * col("cr")).as("ip"))
      .agg(min(col("ip")).as("mi"), count(lit(1)).as("nd"))
      .select(when(col("nd") === depth, col("mi")).otherwise(lit(0L))
        .as("est_rows"))
  }

  /** HyperLogLog distinct-count estimate per key, m = 64 registers
    * (p = 6) over hash64's 60-bit space: bucket = top 6 hash bits,
    * rho = leading-zero rank of the remaining 54 bits (via binary
    * string length, the same engine-portable trick as BM25's integer
    * idf). State is AT MOST 64 small integers per key — max-mergeable
    * across scans, batches, or streams, the industry-standard
    * bounded-state cardinality sketch next to [[kmvDistinctByKey]]'s
    * k-minima (KMV supports set ops; HLL has 64-byte state and
    * union-by-max). The estimate is engine-exact: `S = Σ 2^(55-r)` is
    * an exact long (dyadic terms, ≤ 64·2^55 < 2^62), the raw
    * alpha·m²/S estimate runs in DECIMAL(38,0) floor division, and
    * the small-range linear-counting branch rounds `m·ln(m/V)` at
    * integer grain where the 64 possible V values can't straddle a
    * rounding boundary. Returns (key, est_hll, n_exact) — the exact
    * count rides along for error inspection (same deliberate pattern
    * as cmsJoinSizeEstimate's oracle gate). */
  def hllDistinctByKey(df: DataFrame, keyCol: String, valueCol: String)
      : DataFrame = {
    val twoPow54 = 18014398509481984L // 2^54: splits 60-bit hash 6|54
    val hashed = df.select(col(keyCol).as("key"),
      TextFunctions.hash64(col(valueCol).cast("string")).as("h"))
    val regs = hashed.select(col("key"),
        expr(s"h div ${twoPow54}L").as("bucket"),
        expr(s"h % ${twoPow54}L").as("w"))
      .withColumn("rho", when(col("w") === 0, lit(55))
        .otherwise(lit(55) - length(expr("bin(w)"))))
      .groupBy(col("key"), col("bucket")).agg(max(col("rho")).as("r"))
    // full 64-register spine per key: a missing register is rho 0
    val spine = regs.select(col("key")).distinct()
      .select(col("key"), explode(sequence(lit(0), lit(63))).as("bucket"))
    val full = spine.join(regs, Seq("key", "bucket"), "left")
      .select(col("key"), coalesce(col("r"), lit(0)).as("r"))
    val s = full.groupBy(col("key")).agg(
      sum(expr("shiftleft(1L, cast(55 - r as int))")).as("S"),
      sum(when(col("r") === 0, 1L).otherwise(0L)).as("V"))
    // raw estimate: alpha_64·m²/(S/2^55) = (709·4096·2^55) div
    // (1000·S), exact in DECIMAL(38,0); 709·4096 = 2904064
    val raw = s.withColumn("raw", expr(
      "cast(cast(2904064 as decimal(38,0)) * cast(shiftleft(1L, 55) as " +
        "decimal(38,0)) div (cast(1000 as decimal(38,0)) * " +
        "cast(S as decimal(38,0))) as bigint)"))
    val est = raw.select(col("key"),
      when(col("raw") <= 160 && col("V") > 0,
        round(lit(64) * log(lit(64.0) / col("V"))).cast("long"))
        .otherwise(col("raw")).as("est_hll"))
    val exact = df.select(col(keyCol).as("key"), col(valueCol).as("v"))
      .groupBy(col("key")).agg(countDistinct(col("v")).as("n_exact"))
    est.join(exact, Seq("key"))
  }
}
