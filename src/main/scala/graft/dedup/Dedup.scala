package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.operators.Spread
import graft.operators.Converge.SanitizedCheckpoint

/** Document deduplication operators for training-data pipelines:
  * exact, MinHash+LSH, SimHash, and n-gram Jaccard.
  *
  * Scale design: every variant is candidate-generation-by-equi-join —
  * shuffle keys are (band, bandKey) / (band, bits) / block columns, so
  * work distributes by hash partition and no all-pairs product ever
  * materializes globally. Verification (exact Jaccard / Hamming) runs
  * only inside candidate buckets. All hashing is md5-derived
  * (`TextFunctions.hash64`) for cross-engine reproducibility.
  *
  * Cache lifecycle: pair generators persist() shared subtrees (gram
  * sets, prefix tables) that the RETURNED lazy frame still reads, so
  * they cannot unpersist before the caller materializes. The caller
  * owns release — `spark.catalog.clearCache()` between jobs (as
  * `Bench`/`Verify` do) or `unpersist()` on frames handed back.
  */
object Dedup {

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Exact dedup: one surviving row (minimum id) per distinct text
    * hash. `normalized = true` dedups on the lowercased
    * whitespace-collapsed form. Returns (text_hash, keep_id, n_dups). */
  def exactGroups(df: DataFrame, idCol: String, textCol: String,
                  normalized: Boolean = false): DataFrame = {
    val key = if (normalized)
      md5(regexp_replace(lower(col(textCol)), "\\s+", " "))
    else md5(col(textCol))
    df.select(key.as("text_hash"), col(idCol).as("id"))
      .groupBy(col("text_hash"))
      .agg(min(col("id")).as("keep_id"), count(lit(1)).as("n_dups"))
  }

  /** Rows that survive exact dedup (min id per hash wins). */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keep = exactGroups(df, idCol, textCol)
      .select(col("keep_id").as(idCol))
    df.join(keep, Seq(idCol), "left_semi")
  }

  /** MinHash + banded LSH near-dup pairs.
    *
    * shingle(k words) → n-hash MinHash signature → `bands` band keys →
    * equi-join on (band, key) for candidates → exact Jaccard ≥
    * `threshold` verification. With r = n/bands rows per band, a pair
    * with similarity s collides with probability 1-(1-s^r)^bands.
    * Returns (id_a, id_b, jaccard), id_a < id_b. */
  def minHashPairs(df: DataFrame, idCol: String, textCol: String,
                   shingleK: Int = 3, numHashes: Int = 32, bands: Int = 8,
                   threshold: Double = 0.8): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    // bands=8 × r=4: recall at s=0.8 is 1-(1-0.8^4)^8 ≈ 0.985 and
    // word-3-shingle background similarity is ~0 so band keys stay
    // selective. (r=2 melts down on hot band keys — every doc sharing
    // the globally-min shingle lands in one bucket → n² pairs in one
    // shuffle partition.) The base-hash array is materialized as its
    // own column: HOFs are interpreted with no subexpression
    // elimination, so inlining it under the n minima would run every
    // md5 n times.
    // persisted: this subtree (md5 per shingle + signature) is the most
    // expensive in the operator and is consumed 4× — both sides of the
    // candidate self-join and both sides of the Jaccard verify.
    // Unreferenced cache entries are reclaimed by the ContextCleaner
    // once the result frame is dropped.
    val base = minHashIndex(df, idCol, textCol, shingleK, numHashes)
      .persist()
    val banded = banding(base, numHashes, bands)
    val cand = banded.alias("a")
      .join(banded.alias("b"),
        col("a.band") === col("b.band") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    verifyJaccard(cand, base.select(col("id"), col("sh")), threshold)
  }

  /** The reusable half of MinHash dedup: (id, sh, sig) — distinct
    * word-shingle hashes plus the `numHashes`-minima signature. Compute
    * once per corpus generation and SAVE it; each arriving batch then
    * dedups against the corpus via [[minHashPairsAgainstIndex]] without
    * ever re-hashing corpus text — the incremental-ingest shape (at
    * 100 TB the corpus-side signature pass is the dominant cost and
    * must not repeat per batch).
    *
    * Spread BEFORE shingling: a small single-partition scan would pin
    * the whole per-row hashing pass to one core. Words materialized
    * before the shingle lambda (see TextFunctions lambda-cost rule).
    * The n per-j minima run as ONE fused codegen pass
    * (MinHashSignatureFused) instead of n interpreted array_min HOFs. */
  def minHashIndex(df: DataFrame, idCol: String, textCol: String,
                   shingleK: Int = 3, numHashes: Int = 32): DataFrame = {
    graft.expressions.GraftFunctions.register(df.sparkSession)
    Spread.ensure(df.select(col(idCol).as("id"), col(textCol).as("txt")))
      .select(col("id"), words(col("txt")).as("w"))
      .select(col("id"), shinglesFromWords(col("w"), shingleK).as("sh"))
      .withColumn("bh", minHashBaseHashes(col("sh")))
      .withColumn("sig", call_function(
        graft.expressions.GraftFunctions.MinHashSig,
        col("bh"), lit(numHashes)))
      .select(col("id"), col("sh"), col("sig"))
  }

  /** (id, band, band_key) LSH band rows of a [[minHashIndex]] frame. */
  private def banding(base: DataFrame, numHashes: Int, bands: Int): DataFrame = {
    val r = numHashes / bands
    base.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => concat_ws(",", slice(col("sig"), b * r + 1, lit(r))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_key")
  }

  /** Incremental near-dup detection: probe a NEW batch against a saved
    * corpus signature index (both sides are [[minHashIndex]] outputs
    * with disjoint id spaces — typically the index read back from
    * storage). Same LSH contract as [[minHashPairs]], but the candidate
    * join is probe-bands × index-bands instead of a self-join, so the
    * per-batch cost scales with the batch, not the corpus. Returns
    * (probe_id, index_id, jaccard) with jaccard ≥ threshold. */
  def minHashPairsAgainstIndex(probe: DataFrame, index: DataFrame,
                               numHashes: Int = 32, bands: Int = 8,
                               threshold: Double = 0.8): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    // probe (the small new batch) is persisted — banding + verify read
    // it twice; the index is scan-only on both reads (it lives in
    // storage at scale; caching a 100-TB index is not an option).
    val p = probe.persist()
    val cand = banding(p, numHashes, bands).alias("a")
      .join(banding(index, numHashes, bands).alias("b"),
        col("a.band") === col("b.band") &&
          col("a.band_key") === col("b.band_key"))
      .select(col("a.id").as("probe_id"), col("b.id").as("index_id"))
      .distinct()
    cand
      .join(p.select(col("id").as("probe_id"), col("sh").as("sh_a")),
        Seq("probe_id"))
      .join(index.select(col("id").as("index_id"), col("sh").as("sh_b")),
        Seq("index_id"))
      .select(col("probe_id"), col("index_id"),
        round(jaccard(col("sh_a"), col("sh_b")), 6).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** n-gram Jaccard near-dup pairs inside a blocking column (e.g.
    * language): char-k-gram Jaccard ≥ threshold, exact.
    *
    * Candidate generation is PREFIX FILTERING (SSJoin/ppjoin family),
    * not all-pairs-within-block: grams get a canonical global order
    * (ascending document frequency, rarest first); if J(A,B) ≥ t the
    * pair must share a gram within each side's first
    * |x| − ⌈t·|x|⌉ + 1 grams, so an equi-join on prefix grams is a
    * LOSSLESS candidate filter. This kills the O(n² per block)
    * objection: at 100 TB one language block is billions of docs, and
    * the join key becomes the rare gram (selective by construction)
    * instead of the language.
    *
    * Measured caveat (sf0.1, 5000 docs): the synthetic corpus has only
    * ~1000 distinct 4-grams, so even df-rare prefix grams are shared
    * by hundreds of docs. Prefix-join alone passed 1.48M of 12.5M
    * possible pairs; adding the df≥2 trim and the ppjoin positional
    * bound (both lossless, see below) cuts that to 994k — still
    * verification-dominated, and ~2× slower locally than the old
    * within-block all-pairs join it replaced. The crossover the
    * design bets on is MEASURED in NgramPrefixCrossoverSpec: on a
    * natural-text-shaped corpus (285 letter-word docs, 200k-word
    * Zipf vocabulary, t=0.8) the same pipeline passes 25 candidates
    * of 40,470 possible pairs (0.06%) — exactly the true near-dup
    * set — while remaining bit-identical to the all-pairs
    * definition. The all-pairs form is quadratic per block
    * regardless of corpus; exact-Jaccard verification dominates both
    * designs at equal candidate counts. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        blockCol: String, k: Int = 4,
                        threshold: Double = 0.7): DataFrame = {
    val (cand, sets) = ngramCandidates(df, idCol, textCol, blockCol, k, threshold)
    // join strategy from MEASURED sizes (guide §3.1): the verify
    // joins attach both docs' full hashed-gram arrays to every
    // candidate pair, so the shuffled plan moves
    // ~2·avgLen·16 B·nCand — the r10-measured pressure point (a
    // low-threshold char-gram corpus passes most pairs as
    // candidates: 1.96M of 12.5M at the curve gate, each verify row
    // dragging two full arrays through two exchanges). The SET table
    // itself is one row per doc; while its framed size stays under
    // [[BroadcastVerifySetsMaxBytes]], broadcasting it turns both
    // verify joins into broadcast-hash probes and NO array ever
    // crosses a shuffle. Past the bound (the 100 TB corpus), the
    // measured-partition shuffle plan below is the safe fallback.
    val nCand = cand.count()
    val avgLen = avgSetLen(sets)
    val setBytes = (sets.count() * avgLen * 16.0).toLong
    val inter = call_function(graft.expressions.GraftFunctions.IntersectSizeSorted,
      col("sh_a"), col("sh_b"))
    val verified =
      if (setBytes <= broadcastVerifySetsMaxBytes(df.sparkSession))
        cand
          .join(broadcast(sets.select(col("id").as("id_a"),
            col("sz").as("sz_a"), col("sh").as("sh_a"))), Seq("id_a"))
          .join(broadcast(sets.select(col("id").as("id_b"),
            col("sz").as("sz_b"), col("sh").as("sh_b"))), Seq("id_b"))
      else {
        val n = verifyShufflePartitions(df.sparkSession, nCand, avgLen)
        val conf = sessionShufflePartitions(df.sparkSession)
        val withA = (if (n > conf) cand.repartition(n, col("id_a")) else cand)
          .join(sets.select(col("id").as("id_a"), col("sz").as("sz_a"),
            col("sh").as("sh_a")), Seq("id_a"))
        // the second verify join re-keys on id_b anyway; the explicit
        // repartition just carries the measured partition count
        // instead of falling back to the session conf
        (if (n > conf) withA.repartition(n, col("id_b")) else withA)
          .join(sets.select(col("id").as("id_b"), col("sz").as("sz_b"),
            col("sh").as("sh_b")), Seq("id_b"))
      }
    verified
      .select(col("id_a"), col("id_b"),
        round(inter.cast("double") / (col("sz_a") + col("sz_b") - inter), 6)
          .as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** Framed-size bound under which the per-doc gram-set table is
    * BROADCAST to the verification joins instead of shuffled onto the
    * candidate pairs: one copy per executor (~16 B per hashed gram)
    * versus two arrays per CANDIDATE row through two exchanges —
    * candidates outnumber docs by orders of magnitude exactly when
    * the verify is expensive. 256 MB is comfortably inside executor
    * memory and the 8 GB broadcast cap; a corpus past it falls back
    * to the measured-partition shuffle plan. */
  val BroadcastVerifySetsMaxBytes: Long = 256L * 1024 * 1024

  /** Session override for [[BroadcastVerifySetsMaxBytes]] — cluster
    * profiles with tighter executor memory (or tests forcing the
    * shuffle branch) set `spark.graft.dedup.broadcastVerifySetsMaxBytes`. */
  private def broadcastVerifySetsMaxBytes(
      spark: org.apache.spark.sql.SparkSession): Long =
    scala.util.Try(
      spark.conf.get("spark.graft.dedup.broadcastVerifySetsMaxBytes").toLong)
      .getOrElse(BroadcastVerifySetsMaxBytes)

  /** Partition count for a gram-set verification join, derived from
    * measured candidate volume instead of the session conf.
    *
    * The round-10 scale harness caught exactly one partition-pressure
    * residual (SCALETEST_r10: `q_dedup_curve` 24.7× wall at 10× data,
    * recovered ~30% by one manual partition doubling): the verify
    * join inherited `spark.sql.shuffle.partitions` — sized for the
    * test SF — while every candidate row carries two full hashed-gram
    * arrays. This applies [[graft.validate.Tuning.shuffleAdvice]]
    * automatically at the one place the pressure was measured:
    * partitions grow with candidates × avg set length and never drop
    * below the session conf, so small-volume plans (and their lint /
    * bench records) are byte-identical.
    *
    * 16 B per array element covers the 8 B hashed gram plus
    * UnsafeArrayData headers and exchange-serialization overhead,
    * ×2 arrays per verify row. */
  private[graft] def verifyShufflePartitions(spark: org.apache.spark.sql.SparkSession,
                                             nCand: Long,
                                             avgLen: Double): Int = {
    val conf = sessionShufflePartitions(spark)
    if (nCand <= 0L || !(avgLen > 0)) conf
    else {
      val bytes = (2.0 * avgLen * 16.0 * nCand).toLong
      val cores = math.max(spark.sparkContext.defaultParallelism, 1)
      math.max(conf,
        graft.validate.Tuning.shuffleAdvice(bytes, nCand, 0L, cores)
          .shufflePartitions)
    }
  }

  private[dedup] def sessionShufflePartitions(spark: org.apache.spark.sql.SparkSession): Int =
    scala.util.Try(spark.conf.get("spark.sql.shuffle.partitions").toInt)
      .getOrElse(math.max(spark.sparkContext.defaultParallelism, 1))

  /** Mean hashed-gram set length of a (persisted) `sets` frame — one
    * cached-scan aggregate; 0 for an empty corpus. */
  private def avgSetLen(sets: DataFrame): Double =
    Option(sets.agg(avg(col("sz"))).head().get(0))
      .fold(0.0)(_.asInstanceOf[Double])

  /** Candidate stage of [[ngramJaccardPairs]], exposed for the
    * prefix-filter selectivity spec: returns (candidate id pairs,
    * persisted per-doc gram sets). Both frames are persisted; the
    * caller owns release. */
  private[graft] def ngramCandidates(df: DataFrame, idCol: String,
                                     textCol: String, blockCol: String,
                                     k: Int, threshold: Double
                                    ): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    // Ngrams are hashed to 60-bit longs once per doc (Jaccard over the
    // hashed sets equals Jaccard over the string sets up to a ~1e-13
    // md5-collision risk; the candidate rows shrink from ~6 KB string
    // arrays to nothing — pairs join on narrow (id, blk, sz) rows and
    // arrays are fetched only for surviving candidates).
    graft.expressions.GraftFunctions.register(df.sparkSession)
    val grams = Spread.ensure(df.select(col(idCol).as("id"),
        col(blockCol).as("blk"), col(textCol).as("txt")))
      .select(col("id"), col("blk"), normalized(col("txt")).as("t"))
      .select(col("id"), col("blk"),
        charNgramsFromNormalized(col("t"), k).as("g"))
    // sorted once per doc so pair verification is a codegen'd
    // two-pointer merge (SortedIntersectSize), not a per-pair hash set.
    // Persisted: the gram/md5 subtree feeds the prefix pipeline and
    // the two verification joins.
    val sets = grams.select(col("id"), col("blk"), size(col("g")).as("sz"),
      array_sort(transform(col("g"), s => hash64(s))).as("sh"))
      .persist()
    // materialize BEFORE the plan fans out: the self-join's two map
    // stages (plus tokens/docFreq) are submitted concurrently, and
    // concurrent stages each recompute a lazily-persisted subtree —
    // the cache only wins after someone finished writing it. One
    // eager pass here replaced FOUR simultaneous md5+sort gram
    // pipelines (measured 4× stage work at sf0.1).
    sets.count()
    // canonical order = (document frequency asc, gram): one
    // explode + groupBy-count over all grams, shuffle-keyed by gram
    val tokens = sets.select(col("id"), col("blk"), col("sz"),
      explode(col("sh")).as("g"))
    val docFreq = tokens.groupBy(col("g")).agg(count(lit(1)).as("df"))
    // per-doc prefix = the |x| − ⌈t'·|x|⌉ + 1 rarest grams (t' carries
    // 1e-6 slack for the round(j,6) threshold boundary)
    val byRarity = Window.partitionBy(col("id"))
      .orderBy(col("df"), col("g"))
    val prefix = tokens.join(docFreq, Seq("g"))
      .withColumn("rn", row_number().over(byRarity))
      .where(col("rn") <=
        col("sz") - ceil(lit(threshold - 1e-6) * col("sz")) + 1)
      // df=1 grams can never match across docs — dropping them AFTER
      // the prefix-length cut is lossless (a qualifying pair shares a
      // gram inside both prefixes, and a shared gram has df ≥ 2) and
      // removes the rarest-ranked rows, which are most of the prefix
      .where(col("df") >= 2)
      .select(col("g"), col("blk"), col("id"), col("sz"), col("rn"))
    // candidates: share ≥1 prefix gram in the same block, plus two
    // lossless per-row prunes — the size-ratio filter
    // J(A,B) ≤ min(sz)/max(sz), and the ppjoin positional bound:
    // grams rank in one global (df, g) order, so a match at 1-based
    // rank rn leaves at most sz − rn later grams on that side;
    // overlap ≤ 1 + min(sz_a−rn_a, sz_b−rn_b), and J ≥ t needs
    // overlap ≥ ⌈t/(1+t)·(sz_a+sz_b)⌉. A qualifying pair always
    // survives via its FIRST shared prefix gram (largest bound), so
    // filtering each joined row independently loses nothing.
    val tp = threshold - 1e-6
    // the size-ratio bound J ≤ min/max also moves INTO the equi-join
    // key as a log-width size bucket: ratio ≥ t ⇒ |ln sz_a − ln sz_b|
    // ≤ ln(1/t) ⇒ bucket ids differ by ≤ 1 (width ln(1/t), widened
    // 0.1% against float rounding). The probe side emits bkt−1/bkt/
    // bkt+1 so the match stays an equi-join; each pair meets exactly
    // once. This cuts the materialized (g, blk) join groups ~3×
    // BEFORE the per-row filters run — with few distinct grams (the
    // pathological case for prefix filtering) the join fan-out is the
    // dominant cost, and hash-partitioning by (g, blk, bkt) also
    // spreads a hot gram across more reducers.
    val bktW = math.log(1.0 / (tp * 0.999))
    val build = prefix.withColumn("bkt",
      floor(org.apache.spark.sql.functions.log(col("sz").cast("double")) / bktW))
      .persist()
    build.count() // same concurrent-stage race as `sets` above
    val probe = build.withColumn("bkt",
      explode(array(col("bkt") - 1, col("bkt"), col("bkt") + 1)))
    val cand = build.alias("a")
      .join(probe.alias("b"),
        col("a.g") === col("b.g") && col("a.blk") === col("b.blk") &&
          col("a.bkt") === col("b.bkt") &&
          col("a.id") < col("b.id") &&
          least(col("a.sz"), col("b.sz")).cast("double") /
            greatest(col("a.sz"), col("b.sz")) >= lit(tp) &&
          least(col("a.sz") - col("a.rn"), col("b.sz") - col("b.rn")) + 1 >=
            ceil(lit(tp / (1 + tp)) * (col("a.sz") + col("b.sz"))))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
      .persist()
    // observability for the 100-TB question "how much did the prefix
    // filter prune": candidates are persisted (they feed the verify
    // join anyway), so the count is one cheap cached scan
    log.info(s"ngramJaccardPairs: ${cand.count()} candidate pairs " +
      s"after prefix filtering")
    (cand, sets)
  }

  /** Directed containment pairs: C(A→B) = |g(A) ∩ g(B)| / |g(A)| over
    * distinct word k-shingles — quote/excerpt detection, where a short
    * doc embedded in a longer one scores near 1.0 while its Jaccard
    * stays low. Returns (src_id, dst_id, containment) with src the
    * contained side; both directions are examined (containment is
    * asymmetric, so q_dedup_ngram's id_a<id_b trick doesn't apply).
    *
    * Same lossless prefix-filter design as [[ngramJaccardPairs]], with
    * the bounds reshaped for asymmetry: C ≥ t needs overlap ≥
    * ⌈t·|A|⌉, so (a) only the SRC side is prefix-trimmed to its
    * |A| − ⌈t·|A|⌉ + 1 rarest grams (the DST side must keep ALL grams
    * — a contained gram can sit anywhere in the container); (b) the
    * size bound is one-sided: |B| ≥ ⌈t·|A|⌉, no upper bound, so no
    * size-bucket equi-key. Word shingles (not char grams) keep the
    * gram space high-cardinality, which is what makes the prefix join
    * selective. df=1 grams still prune (a cross-doc match needs
    * df ≥ 2). */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
                       k: Int = 5, threshold: Double = 0.6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.expressions.GraftFunctions.register(df.sparkSession)
    val base = Spread.ensure(df.select(col(idCol).as("id"),
        col(textCol).as("txt")))
      .select(col("id"), words(col("txt")).as("w"))
      .select(col("id"), shinglesFromWords(col("w"), k).as("g"))
    val sets = base.select(col("id"), size(col("g")).as("sz"),
      array_sort(transform(col("g"), s => hash64(s))).as("sh"))
      .persist()
    sets.count() // materialize before the plan fans out (see ngram op)
    val tokens = sets.select(col("id"), col("sz"), explode(col("sh")).as("g"))
    val docFreq = tokens.groupBy(col("g")).agg(count(lit(1)).as("df"))
      .where(col("df") >= 2)
    val tp = threshold - 1e-6
    val byRarity = Window.partitionBy(col("id"))
      .orderBy(col("df"), col("g"))
    // src prefix: rarest |A| − ⌈t·|A|⌉ + 1 grams (inner join to the
    // df≥2 list is itself lossless here — see scaladoc)
    val srcPrefix = tokens.join(docFreq, Seq("g"))
      .withColumn("rn", row_number().over(byRarity))
      .where(col("rn") <= col("sz") - ceil(lit(tp) * col("sz")) + 1)
      .select(col("g"), col("id").as("src_id"), col("sz").as("src_sz"))
    // the dst gram column is RENAMED: both sides fork from `tokens`,
    // so srcPrefix("g")/dstAll("g") would resolve to the same
    // attribute and collapse the join key to a tautology
    val dstAll = tokens.join(docFreq, Seq("g"))
      .select(col("g").as("gd"), col("id").as("dst_id"),
        col("sz").as("dst_sz"))
    val cand = srcPrefix.join(dstAll,
        col("g") === col("gd") &&
          col("src_id") =!= col("dst_id") &&
          col("dst_sz") >= ceil(lit(tp) * col("src_sz")))
      .select(col("src_id"), col("dst_id")).distinct()
      .persist()
    // persisted + counted for the same two reasons as ngramCandidates:
    // prune observability, and measured sizing of the verify shuffle
    val n = verifyShufflePartitions(df.sparkSession, cand.count(),
      avgSetLen(sets))
    val conf = sessionShufflePartitions(df.sparkSession)
    val inter = call_function(graft.expressions.GraftFunctions.IntersectSizeSorted,
      col("sh_src"), col("sh_dst"))
    val withSrc = (if (n > conf) cand.repartition(n, col("src_id")) else cand)
      .join(sets.select(col("id").as("src_id"), col("sz").as("sz_src"),
        col("sh").as("sh_src")), Seq("src_id"))
    (if (n > conf) withSrc.repartition(n, col("dst_id")) else withSrc)
      .join(sets.select(col("id").as("dst_id"), col("sh").as("sh_dst")),
        Seq("dst_id"))
      .select(col("src_id"), col("dst_id"),
        round(inter.cast("double") / col("sz_src"), 6).as("containment"))
      .where(col("containment") >= threshold)
  }

  /** SimHash near-dup pairs: 60-bit simhash, banded into `bands`
    * 15-bit keys (a pair within Hamming distance < bands must share at
    * least one exact band — pigeonhole), verified by exact Hamming ≤
    * maxHamming. Returns (id_a, id_b, hamming_dist). */
  def simHashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3, bands: Int = 4): DataFrame = {
    // word-hash array materialized first (one md5 pass), then the 60
    // bit folds run as one fused codegen'd expression
    graft.expressions.GraftFunctions.register(df.sparkSession)
    val base = Spread.ensure(df.select(col(idCol).as("id"),
        col(textCol).as("txt")))
      .select(col("id"), wordHashes(col("txt")).as("h"))
      .withColumn("sh", call_function(
        graft.expressions.GraftFunctions.SimHash, col("h")))
      .select(col("id"), col("sh"))
    hammingPairs(base, "id", "sh", SimhashBits, maxHamming, bands)
  }

  /** Generic Hamming-banded near-dup join over ANY integer bit
    * signature (text SimHash, image aHash, audio fingerprints…):
    * split the `bits`-bit signature into `bands` equal bands, equi-
    * join on (band index, band bits) — pigeonhole guarantees every
    * pair within Hamming distance < bands shares at least one exact
    * band — then verify with exact `bit_count(xor)` ≤ maxHamming.
    * Returns (id_a, id_b, hamming_dist).
    *
    * Scale: the only shuffle is the equi-join on the band key; no
    * all-pairs anywhere. The signature frame is persisted here because
    * both sides of the self-join read it — callers' signatures often
    * come from expensive subtrees (md5 passes, pixel decodes) that
    * must not run twice (caller's clearCache owns the release). */
  def hammingPairs(sig: DataFrame, idCol: String, sigCol: String,
                   bits: Int, maxHamming: Int, bands: Int): DataFrame = {
    require(bands >= 1 && bits % bands == 0,
      s"bands ($bands) must divide the signature width ($bits)")
    require(maxHamming < bands,
      s"banding with $bands bands only guarantees recall for Hamming " +
        s"< bands; maxHamming=$maxHamming needs more bands")
    val bitsPerBand = bits / bands
    val mask = if (bitsPerBand >= 64) lit(-1L)
      else lit((1L << bitsPerBand) - 1)
    val base = sig.select(col(idCol).as("id"), col(sigCol).as("sig"))
      .persist()
    // arithmetic shiftright sign-extends the top band of a 64-bit
    // signature; the mask strips the extension so band keys are exact
    val banded = base.select(col("id"), col("sig"),
      posexplode(array((0 until bands).map(b =>
        shiftright(col("sig"), b * bitsPerBand).bitwiseAND(mask)): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_key")
    // verify (cheap bit_count) BEFORE distinct: hot band keys can blow
    // the join output up quadratically, and distinct() would shuffle
    // the whole blowup; the hamming filter collapses it first.
    banded.alias("a")
      .join(banded.alias("b"),
        col("a.band") === col("b.band") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        hamming(col("a.sig"), col("b.sig")).as("hamming_dist"))
      .where(col("hamming_dist") <= maxHamming)
      .distinct()
  }

  /** Embedding cosine near-dup pairs within a blocking column (IVF
    * cell / cluster label): pairs with cosine ≥ threshold. */
  def embeddingNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                            blockCol: String, threshold: Double,
                            salt: Int = 8): DataFrame = {
    graft.expressions.GraftFunctions.register(df.sparkSession)
    // persisted: both sides of the salted self-join read this subtree
    val base = Spread.ensure(df.select(col(idCol).as("id"),
      col(blockCol).as("blk"), col(vecCol).cast("array<double>").as("v")))
      .persist()
    // salted block join (see ngramJaccardPairs): a handful of cluster
    // labels would otherwise cap the pairwise-cosine stage at
    // #labels tasks
    val a = base.withColumn("salt", pmod(hash(col("id")), lit(salt)))
    val b = base.withColumn("salt", explode(sequence(lit(0), lit(salt - 1))))
    a.alias("a")
      .join(b.alias("b"),
        col("a.blk") === col("b.blk") && col("a.salt") === col("b.salt") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        round(call_function(graft.expressions.GraftFunctions.Cosine,
          col("a.v"), col("b.v")), 6).as("cosine"))
      .where(col("cosine") >= threshold)
  }

  /** Resolve near-dup pairs into duplicate clusters (connected
    * components) with alternating large-star / small-star rounds
    * (the two-phase star algorithm from the public Connected
    * Components in MapReduce literature): each round rewires edges
    * toward each neighborhood's minimum, and the alternation
    * converges in O(log n) rounds on ANY graph shape — a long chain
    * that takes O(n) rounds under min-label propagation (this
    * function's previous algorithm) collapses logarithmically here.
    * The fixed point is a star per component centered at its minimum
    * id, so the result is the same (id, cluster_id = component min)
    * for every id that appears in a pair.
    *
    * Scale notes: each half-round is one partial-aggregated groupBy
    * (neighborhood min) + one equi-join, both shuffle-keyed on node
    * id. `localCheckpoint` truncates the growing lineage per round
    * (on a cluster, swap for a reliable checkpoint dir); the driver
    * only sees per-check edge counts + checksums, never row data.
    * Convergence is detected by an (count, hash-sum) signature match
    * and then CONFIRMED exactly with one except() — paid once. */
  def duplicateClusters(pairs: DataFrame, idA: String = "id_a",
                        idB: String = "id_b", maxIters: Int = 20,
                        checkpointDir: Option[String] = None): DataFrame = {
    // `checkpointDir` set → reliable HDFS/object-store checkpoints that
    // survive executor death (the cluster deployment); unset →
    // executor-local checkpoints (fast, fine for single-JVM runs).
    checkpointDir.foreach(pairs.sparkSession.sparkContext.setCheckpointDir)
    def materialize(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint() else df.sanitizedCheckpoint()

    // ONE materialization of the (possibly expensive) pairs lineage;
    // edge list and node universe both read the checkpoint. Canonical
    // form: hi ≥ lo; self-pairs survive here (they carry the node
    // into `nodes`) and drop from the iterated edge set below.
    val canon = materialize(
      pairs.select(greatest(col(idA), col(idB)).as("hi"),
        least(col(idA), col(idB)).as("lo")).distinct())
    val edges0 = canon.where(col("hi") =!= col("lo"))
    val nodes = canon.select(col("hi").as("id"))
      .unionByName(canon.select(col("lo").as("id"))).distinct()

    // large-star: for every node u (symmetric view), attach each
    // STRICTLY LARGER neighbor v to m = min(Γ(u) ∪ {u}). Output is
    // already canonical (v > u ≥ m); duplicate (v, m) rows from
    // different centers are tolerated — small-star's min-agg ignores
    // them and its final distinct collapses them — so no extra
    // distinct shuffle here.
    def largeStar(e: DataFrame): DataFrame = {
      val s = e.select(col("hi").as("u"), col("lo").as("v"))
        .unionByName(e.select(col("lo").as("u"), col("hi").as("v")))
      val m = s.groupBy(col("u"))
        .agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      s.join(m, Seq("u")).where(col("v") > col("u"))
        .select(col("v").as("hi"), col("m").as("lo"))
    }
    // small-star: group the canonical (hi → smaller neighbors) view
    // by hi; attach every smaller neighbor AND hi itself to the
    // neighborhood min. mn < hi always, so (hi, mn) is canonical;
    // (v, mn) needs re-canonicalizing only in the degenerate v = mn
    // case, which the self-loop filter drops.
    def smallStar(e: DataFrame): DataFrame = {
      val m = e.groupBy(col("hi")).agg(min(col("lo")).as("mn"))
      e.join(m, Seq("hi"))
        .select(col("lo").as("a"), col("mn").as("b"))
        .unionByName(m.select(col("hi").as("a"), col("mn").as("b")))
        .where(col("a") =!= col("b"))
        .select(greatest(col("a"), col("b")).as("hi"),
          least(col("a"), col("b")).as("lo"))
        .distinct()
    }

    // count + order-independent XOR checksum (never overflows under
    // ANSI arithmetic; edges are distinct so nothing self-cancels),
    // collected DURING the materializing job via Converge.withSig —
    // one job per round, not checkpoint + separate aggregate
    def matWithSig(e: DataFrame): (DataFrame, (Long, Long)) =
      graft.operators.Converge.withSig(e, "hi, lo")(materialize)

    // every round materializes + converge-checks (unlike min-label
    // propagation there are only O(log n) rounds, and shallow
    // near-dup graphs finish in 1-2 — a skipped check would buy one
    // fused lineage but usually pay a whole wasted round)
    var (edges, sig) = matWithSig(edges0)
    var it = 0
    var converged = false
    while (!converged && it < maxIters) {
      val (stepped, next) = matWithSig(smallStar(largeStar(edges)))
      it += 1
      if (next == sig) {
        // signature match is 64-bit-probabilistic; confirm exactly,
        // once: both sides are distinct, so every edge of the true
        // fixed point appears exactly twice in the union
        converged = stepped.unionByName(edges)
          .groupBy(col("hi"), col("lo")).agg(count(lit(1)).as("n"))
          .where(col("n") =!= 2).isEmpty
      }
      sig = next
      edges = stepped
    }
    log.info(s"duplicateClusters: ${if (converged) "converged" else "capped"}" +
      s" after $it star round(s), ${sig._1} star edges")

    // At the fixed point each hi carries exactly one lo (its component
    // min). On the CAPPED path a mid-run edge set can still hold one
    // hi with several lo values — min-aggregate so the one-row-per-id
    // output contract holds either way (free at the fixed point: the
    // groupBy collapses nothing and min is the identity).
    val stars = if (converged) edges
      else edges.groupBy(col("hi")).agg(min(col("lo")).as("lo"))
    if (!converged) log.warn(
      s"duplicateClusters: hit maxIters=$maxIters before the star fixed " +
        "point; labels are each node's best-known (not necessarily " +
        "component-global) minimum")

    // fixed point = (member, center) stars; centers and
    // self-pair-only nodes label themselves
    nodes.join(stars, nodes("id") === stars("hi"), "left")
      .select(col("id"), coalesce(col("lo"), col("id")).as("cluster_id"))
  }

  /** INCREMENTAL cluster maintenance: fold newly-discovered pairs into
    * an existing (id, cluster_id) labeling without re-clustering the
    * corpus. A labeling is a connectivity-preserving edge set (every
    * member — center star), so running [[duplicateClusters]] over
    * `labels ∪ newPairs` reaches the same fixed point as re-clustering
    * all historical pairs — at per-batch cost ∝ |labels| + |newPairs|
    * (one edge per already-labeled node, NOT the historical pair
    * count, and the star shape re-converges in O(1) rounds unless the
    * new pairs genuinely bridge clusters). This is the maintenance
    * loop behind a standing dedup index: probe a batch
    * ([[minHashPairsAgainstIndex]]), then fold the resulting pairs in
    * here. */
  def duplicateClustersIncremental(labels: DataFrame, newPairs: DataFrame,
                                   idA: String = "id_a",
                                   idB: String = "id_b",
                                   maxIters: Int = 20,
                                   checkpointDir: Option[String] = None
                                  ): DataFrame = {
    val labelEdges = labels
      .select(col("id").as(idA), col("cluster_id").as(idB))
    duplicateClusters(
      labelEdges.unionByName(newPairs.select(col(idA), col(idB))),
      idA, idB, maxIters, checkpointDir)
  }

  /** MinHash's verify join deliberately does NOT get the
    * [[verifyShufflePartitions]] treatment: banded-LSH candidate
    * volume is bounded by band collisions (measured flat through the
    * 100× scale run — 36 s, SCALETEST_r10_x100), and sizing it would
    * force a persist+count of a frame that is otherwise consumed
    * exactly once. The sizing applies where the harness measured
    * pressure: the prefix-filter family, whose candidate counts track
    * corpus similarity structure instead of band width. */
  private def verifyJaccard(cand: DataFrame, sets: DataFrame,
                            threshold: Double): DataFrame =
    cand
      .join(sets.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sets.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        round(jaccard(col("sh_a"), col("sh_b")), 6).as("jaccard"))
      .where(col("jaccard") >= threshold)
}
