package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The hashing trick (Weinberger et al., "Feature Hashing for Large
  * Scale Multitask Learning", ICML 2009): project an unbounded token
  * vocabulary into a fixed-dimension feature space by hashing each
  * token to a bucket, with an independent ±1 sign hash so colliding
  * tokens cancel in expectation instead of accumulating bias. This is
  * the vocabulary-free featurizer for quality classifiers and dedup
  * prefilters at corpus scale — no vocab build, no broadcast
  * dictionary, each executor hashes independently.
  *
  * Hashing is the repo-wide md5-derived `hash64` (engine-reproducible;
  * TextFunctions.scala:15) rather than xxhash64/murmur, so the DuckDB
  * oracle replays buckets and signs 1:1. Counts are exact integers.
  *
  * Scale design: explode(words) → groupBy(doc, bucket) with map-side
  * combine; output is at most `dim` rows per document regardless of
  * document length, and the shuffle key (doc_id, bucket) is uniform
  * by construction (hash buckets), so no salting is ever needed.
  */
object FeatureHash {

  /** Hash bucket in [0, dim) for a token column. */
  def bucket(token: Column, dim: Int): Column =
    pmod(TextFunctions.hash64(token), lit(dim.toLong))

  /** ±1 sign from an independent bit of a salted hash. */
  def sign(token: Column): Column =
    when(pmod(TextFunctions.hash64(concat(lit("s#"), token)), lit(2L)) === 0L,
      lit(1L)).otherwise(lit(-1L))

  /** Sparse hashed term-frequency vectors: one row per (document,
    * non-empty bucket) with the raw collision-summed count and the
    * sign-corrected value.
    *
    * @return (idCol, bucket, tf, signed_tf) — tf = Σ counts landing
    *         in the bucket, signed_tf = Σ sign(token)·count
    */
  def hashedTf(df: DataFrame, idCol: String, textCol: String,
               dim: Int): DataFrame = {
    require(dim > 0, s"dim must be positive, got $dim")
    df.select(col(idCol), explode(TextFunctions.words(col(textCol))).as("w"))
      .select(col(idCol), bucket(col("w"), dim).as("bucket"),
        sign(col("w")).as("sg"))
      .groupBy(col(idCol), col("bucket"))
      .agg(count(lit(1)).as("tf"), sum(col("sg")).as("signed_tf"))
  }
}
