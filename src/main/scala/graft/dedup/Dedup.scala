package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Document deduplication operators for training-data pipelines:
  * exact, MinHash+LSH, SimHash, and n-gram Jaccard.
  *
  * Scale design: every variant is candidate-generation-by-equi-join —
  * shuffle keys are (band, bandKey) / (band, bits) / block columns, so
  * work distributes by hash partition and no all-pairs product ever
  * materializes globally. Verification (exact Jaccard / Hamming) runs
  * only inside candidate buckets. All hashing is md5-derived
  * (`TextFunctions.hash64`) for cross-engine reproducibility.
  */
object Dedup {

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
                   shingleK: Int = 3, numHashes: Int = 16, bands: Int = 8,
                   threshold: Double = 0.8): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    val base = df.select(col(idCol).as("id"),
        shingles(col(textCol), shingleK).as("sh"))
      .withColumn("sig", minHashSignature(col("sh"), numHashes))
    val banded = base.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => concat_ws(",", slice(col("sig"), b * r + 1, lit(r))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_key")
    val cand = banded.alias("a")
      .join(banded.alias("b"),
        col("a.band") === col("b.band") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    verifyJaccard(cand, base.select(col("id"), col("sh")), threshold)
  }

  /** n-gram Jaccard near-dup pairs inside a blocking column (e.g.
    * language): all pairs within a block, char-k-gram Jaccard ≥
    * threshold. Exact within block; the block join is the shuffle key. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        blockCol: String, k: Int = 4,
                        threshold: Double = 0.7): DataFrame = {
    val base = df.select(col(idCol).as("id"), col(blockCol).as("blk"),
      charNgrams(col(textCol), k).as("sh"))
    val cand = base.alias("a")
      .join(base.alias("b"),
        col("a.blk") === col("b.blk") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        round(jaccard(col("a.sh"), col("b.sh")), 6).as("jaccard"))
    cand.where(col("jaccard") >= threshold)
  }

  /** SimHash near-dup pairs: 60-bit simhash, banded into `bands`
    * 15-bit keys (a pair within Hamming distance < bands must share at
    * least one exact band — pigeonhole), verified by exact Hamming ≤
    * maxHamming. Returns (id_a, id_b, hamming_dist). */
  def simHashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3, bands: Int = 4): DataFrame = {
    val bitsPerBand = SimhashBits / bands
    val mask = (1L << bitsPerBand) - 1
    val base = df.select(col(idCol).as("id"), simhash(col(textCol)).as("sh"))
    val banded = base.select(col("id"), col("sh"),
      posexplode(array((0 until bands).map(b =>
        shiftright(col("sh"), b * bitsPerBand).bitwiseAND(lit(mask))): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_key")
    banded.alias("a")
      .join(banded.alias("b"),
        col("a.band") === col("b.band") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        hamming(col("a.sh"), col("b.sh")).as("hamming_dist"))
      .distinct()
      .where(col("hamming_dist") <= maxHamming)
  }

  /** Embedding cosine near-dup pairs within a blocking column (IVF
    * cell / cluster label): pairs with cosine ≥ threshold. */
  def embeddingNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                            blockCol: String, threshold: Double): DataFrame = {
    val base = df.select(col(idCol).as("id"), col(blockCol).as("blk"),
      col(vecCol).cast("array<double>").as("v"))
    base.alias("a")
      .join(base.alias("b"),
        col("a.blk") === col("b.blk") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        round(graft.similarity.Similarity.cosine(col("a.v"), col("b.v")), 6)
          .as("cosine"))
      .where(col("cosine") >= threshold)
  }

  private def verifyJaccard(cand: DataFrame, sets: DataFrame,
                            threshold: Double): DataFrame =
    cand
      .join(sets.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sets.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        round(jaccard(col("sh_a"), col("sh_b")), 6).as("jaccard"))
      .where(col("jaccard") >= threshold)
}
